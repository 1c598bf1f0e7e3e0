import numpy as np
import pandas as pd
import pytest

from polara_tpu.data import RecommenderData
from polara_tpu.models import SVDModel, PopularityModel
from polara_tpu.evaluation import engine, pipelines


@pytest.fixture
def data(synthetic_interactions):
    data = RecommenderData(synthetic_interactions, "userid", "movieid",
                           "rating", seed=0, verbose=False)
    data.warm_start = False
    data.holdout_size = 2
    data.test_ratio = 0.25
    data.test_fold = 1
    return data


def quiet(model):
    model.verbose = False
    return model


def test_evaluate_models_table(data):
    models = [quiet(SVDModel(data)), quiet(PopularityModel(data))]
    models[0].rank = 4
    table = engine.evaluate_models(models, "main")
    assert set(table.index) == {"PureSVD", "MP"}
    assert ("relevance", "recall") in table.columns
    assert ("ranking", "ndcg") in table.columns


def test_topk_test_reuses_recommendations(data):
    model = quiet(SVDModel(data))
    model.rank = 4
    table = engine.topk_test([model], topk_list=[2, 5], metrics="relevance")
    assert list(table.index.get_level_values("top-n").unique()) == [2, 5]
    r5 = table.loc[(5, "PureSVD"), ("relevance", "recall")]
    r2 = table.loc[(2, "PureSVD"), ("relevance", "recall")]
    assert r5 >= r2


def test_run_cv_experiment(data):
    models = [quiet(SVDModel(data)), quiet(PopularityModel(data))]
    models[0].rank = 4
    table = engine.run_cv_experiment(models, folds=[1, 2],
                                     metrics="relevance")
    assert table.index.names[0] == "fold"
    assert len(table.loc[1]) == 2
    # CV re-splits changed the test users between folds
    assert not table.loc[1].equals(table.loc[2])


def test_holdout_test(data):
    model = quiet(PopularityModel(data))
    table = engine.holdout_test([model], holdout_sizes=[1, 2],
                                metrics="relevance")
    assert set(table.index.get_level_values("hsize")) == {1, 2}


def test_sample_ci(data):
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0, 2.0]})
    ci = engine.sample_ci(df)
    assert ci["a"] > 0


def test_random_grid_unique_and_sized():
    grid, names = pipelines.random_grid(
        {"rank": [2, 4, 8], "scaling": [0.2, 0.4]}, n=4, seed=0)
    assert names == ("rank", "scaling")
    assert len(grid) == 4
    assert len(set(grid)) == 4


def test_random_grid_skip_config():
    grid, _ = pipelines.random_grid(
        {"a": [1, 2], "b": [1, 2]}, n=0,
        skip_config=lambda cfg: cfg[0] == cfg[1])
    assert all(a != b for a, b in grid)


def test_find_optimal_svd_rank_single_build(data):
    model = quiet(SVDModel(data))
    build_calls = []
    original_build = model.build

    def counting_build(*args, **kwargs):
        build_calls.append(1)
        return original_build(*args, **kwargs)

    model.build = counting_build
    best, scores = pipelines.find_optimal_svd_rank(
        model, [2, 4, 6], "recall", return_scores=True)
    assert len(build_calls) == 1  # factor truncation, no rebuilds
    assert best in (2, 4, 6)
    assert list(scores.index) == [2, 4, 6]
    # protected factors restored at the top rank
    assert model.factors["movieid"].shape[1] >= 6


def test_find_optimal_config(data):
    model = quiet(PopularityModel(data))
    grid, names = pipelines.random_grid(
        {"by_feedback_value": [True, False]}, n=2, seed=0)
    best = pipelines.find_optimal_config(model, grid, names, "recall")
    assert "by_feedback_value" in best


def test_plotting_smoke(data):
    import matplotlib
    matplotlib.use("Agg")
    from polara_tpu.evaluation import plotting
    model = quiet(SVDModel(data))
    model.rank = 4
    model.switch_positive = 4
    table = engine.topk_test([model], topk_list=[2, 5], metrics="all")
    scores = {name: table[name]
              for name in ("relevance", "ranking", "hits")}
    plotting.show_hits(scores)
    plotting.show_ranking(scores)
    plotting.show_hit_rates(scores)
    plotting.show_precision_recall(scores)


def test_find_optimal_tucker_ranks(data):
    from polara_tpu.evaluation.pipelines import find_optimal_tucker_ranks
    from polara_tpu.models import CoffeeModel

    model = CoffeeModel(data)
    model.verbose = False
    grids = ([3, 4], [3, 4], [2])  # per-mode candidate ranks
    best, scores = find_optimal_tucker_ranks(
        model, grids, target_metric="arhr", return_scores=True)
    assert best[0] in grids[0] and best[1] in grids[1] and best[2] in grids[2]
    assert len(scores) == 4  # feasible combinations


def test_mml_command_building(tmp_path, data):
    from polara_tpu.models.external.mymedialite import MyMediaLiteWrapper

    data.name = "unit"
    model = MyMediaLiteWrapper("/opt/mml", str(tmp_path), "BPRMF", data)
    model.rank = 7
    command = model._run_external(debug=True)
    assert "--recommender=BPRMF" in command
    assert "num_factors=7" in command
    assert str(tmp_path) in command
    assert "/opt/mml/item_recommendation" in command

    model._save_to_disk()
    import pandas as pd
    written = pd.read_csv(model.train_data_path, header=None)
    assert len(written) > 0


def test_evaluate_topk_rollback(data):
    from polara_tpu.models import PopularityModel
    model = PopularityModel(data)
    model.verbose = False
    model.topk = 10
    full = model.recommendations.copy()
    small = model.evaluate("relevance", topk=3, simple_rates=True)
    assert model.topk == 10  # unchanged
    np.testing.assert_array_equal(model.recommendations, full)  # cached
    big = model.evaluate("relevance", topk=20, simple_rates=True)
    assert model.topk == 20  # grew to cover the request
    assert model.recommendations.shape[1] == 20


def test_rank_sweep_padding_matches_slicing(data):
    """Zero-padded truncation scores identically to hard slicing."""
    from polara_tpu.evaluation.pipelines import find_optimal_svd_rank
    from polara_tpu.models import SVDModel

    model = SVDModel(data)
    model.verbose = False
    _, padded = find_optimal_svd_rank(model, [4, 8, 12], "arhr",
                                      return_scores=True,
                                      pad_to_top_rank=True)
    model2 = SVDModel(data)
    model2.verbose = False
    _, sliced = find_optimal_svd_rank(model2, [4, 8, 12], "arhr",
                                      return_scores=True,
                                      pad_to_top_rank=False)
    import numpy as np
    np.testing.assert_allclose(padded.values, sliced.values, rtol=1e-6)
