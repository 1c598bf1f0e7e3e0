"""Serving bundle: compiled fixed-shape inference over trained factors."""
import numpy as np
import pytest

from polara_tpu.data import RecommenderData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.models import SVDModel
from polara_tpu.runtime.serving import ServingBundle


@pytest.fixture(scope="module")
def trained_model():
    events = make_synthetic_interactions(n_users=80, n_items=50,
                                         n_events=1500, seed=0)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    model = SVDModel(data)
    model.rank = 10
    model.verbose = False
    model.build()
    return model


def test_bundle_matches_model_scoring(trained_model):
    bundle = ServingBundle.from_model(trained_model, topk=5, batch_size=16)
    bundle.warmup()
    profiles, test_users = trained_model.get_test_matrix()
    recs = bundle.recommend(np.asarray(profiles))
    assert recs.shape == (profiles.shape[0], 5)

    # manual check: masked dense scoring for one user
    v = np.asarray(trained_model.factors["movieid"])
    p = np.asarray(profiles)
    scores = (p @ v) @ v.T
    scores[p > 0] = -np.inf
    expect = np.argsort(-scores[0], kind="stable")[:5]
    np.testing.assert_array_equal(recs[0], expect)


def test_bundle_event_list_requests(trained_model):
    bundle = ServingBundle.from_model(trained_model, topk=4, batch_size=8)
    recs = bundle.recommend([[1, 2, 3], {7: 5.0, 9: 3.0}])
    assert recs.shape == (2, 4)
    assert not (set(recs[0]) & {1, 2, 3})        # seen filtered
    assert not (set(recs[1]) & {7, 9})


def test_bundle_save_load_roundtrip(trained_model, tmp_path):
    bundle = ServingBundle.from_model(trained_model, topk=3, batch_size=4)
    profiles, _ = trained_model.get_test_matrix()
    before = bundle.recommend(np.asarray(profiles)[:6])
    path = str(tmp_path / "bundle.npz")
    bundle.save(path)
    restored = ServingBundle.load(path)
    assert restored.topk == 3 and restored.batch_size == 4
    np.testing.assert_array_equal(
        restored.recommend(np.asarray(profiles)[:6]), before)


def test_bundle_requires_built_model():
    events = make_synthetic_interactions(n_users=20, n_items=15,
                                         n_events=200, seed=1)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.prepare_training_only()
    model = SVDModel(data)
    with pytest.raises(ValueError, match="no item factors"):
        ServingBundle.from_model(model)


def test_empty_and_ambiguous_requests(trained_model):
    bundle = ServingBundle.from_model(trained_model, topk=4, batch_size=8)
    empty = bundle.recommend([])
    assert empty.shape == (0, 4)

    # nested lists of exactly n_items entries are ambiguous -> explicit
    dense_as_lists = [[0.0] * bundle.n_items]
    with pytest.raises(ValueError, match="ambiguous"):
        bundle.recommend(dense_as_lists)


def test_hybrid_svd_bundle_matches_model():
    import jax.numpy as jnp
    from polara_tpu.data.hybrid import SimilarityDataModel
    from polara_tpu.models import HybridSVD

    rs = np.random.RandomState(2)
    n_items = 30
    base = rs.rand(n_items, 4)
    sim = base @ base.T
    d = np.sqrt(np.diag(sim))
    sim = sim / d[:, None] / d[None, :]

    events = make_synthetic_interactions(n_users=50, n_items=n_items,
                                         n_events=700, seed=2)
    data = SimilarityDataModel(events, "userid", "movieid", "rating",
                               seed=0, verbose=False,
                               relations_matrices={"movieid": sim},
                               relations_indices={"movieid":
                                                  np.arange(n_items)})
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    model = HybridSVD(data)
    model.rank = 6
    model.verbose = False
    model.build()

    bundle = ServingBundle.from_model(model, topk=5, batch_size=8)
    profiles, _ = model.get_test_matrix()
    recs = bundle.recommend(np.asarray(profiles))

    vr = np.asarray(model.factors["movieid_projector_right"],
                    dtype=np.float32)
    vl = np.asarray(model.factors["movieid_projector_left"],
                    dtype=np.float32)
    p = np.asarray(profiles, dtype=np.float32)
    scores = (p @ vr) @ vl.T
    scores[p > 0] = -np.inf
    expect = np.argsort(-scores[3], kind="stable")[:5]
    np.testing.assert_array_equal(recs[3], expect)


def test_event_path_agrees_with_dense_profiles(trained_model):
    """The low-bandwidth request encodings (implicit id lists, explicit
    rating dicts, iterables, mixed batches) must pick the same items as
    equivalent dense profiles."""
    bundle = ServingBundle.from_model(trained_model, topk=5, batch_size=16)
    n_items = bundle.n_items
    rs = np.random.RandomState(3)
    event_lists = [rs.choice(n_items, rs.randint(1, 9),
                             replace=False).tolist() for _ in range(23)]
    dense = np.zeros((23, n_items), np.float32)
    for r, ev in enumerate(event_lists):
        dense[r, ev] = 1.0
    np.testing.assert_array_equal(bundle.recommend_events(event_lists),
                                  bundle.recommend(dense))

    # explicit ratings (disables the implicit all-ones collapse)
    dict_reqs = [{int(i): float(v) for i, v in
                  zip(ev, rs.randint(1, 6, len(ev)))} for ev in event_lists]
    dense_w = np.zeros((23, n_items), np.float32)
    for r, d in enumerate(dict_reqs):
        for i, v in d.items():
            dense_w[r, i] = v
    np.testing.assert_array_equal(bundle.recommend_events(dict_reqs),
                                  bundle.recommend(dense_w))

    # mixed encodings in one batch, including a plain iterable
    mixed = [event_lists[0], dict(zip(event_lists[1],
                                      [1.0] * len(event_lists[1]))),
             iter(event_lists[2])]
    expect = bundle.recommend(dense[:3])
    np.testing.assert_array_equal(bundle.recommend_events(mixed), expect)


def test_event_path_width_bucketing(trained_model):
    """Histories crossing the power-of-two width buckets (and an empty
    request row) keep exact agreement with dense scoring."""
    bundle = ServingBundle.from_model(trained_model, topk=4, batch_size=8)
    n_items = bundle.n_items
    rs = np.random.RandomState(5)
    reqs = [rs.choice(n_items, n, replace=False).tolist()
            for n in (1, 2, 17, 33, n_items)]
    reqs.append([])                      # cold user: nothing seen
    dense = np.zeros((len(reqs), n_items), np.float32)
    for r, ev in enumerate(reqs):
        dense[r, ev] = 1.0
    out = bundle.recommend_events(reqs)
    np.testing.assert_array_equal(out, bundle.recommend(dense))
    assert out.shape == (len(reqs), 4)


def test_evaluate_keeps_recommendations_on_device(trained_model):
    """evaluate() must not force the rec panel to host: the cache stays
    a jax array until the public property is read."""
    import jax
    trained_model._recommendations = None
    trained_model.evaluate("ranking")
    assert isinstance(trained_model._recommendations, jax.Array)
    recs = trained_model.recommendations           # public contract: host
    assert isinstance(recs, np.ndarray)
    assert isinstance(trained_model._recommendations, np.ndarray)


def test_warmup_precompiles_event_path(trained_model):
    """After warmup(event_widths=...), a request inside a listed width
    bucket must not trigger a fresh trace/compile."""
    from polara_tpu.runtime import serving as serving_mod

    bundle = ServingBundle.from_model(trained_model, topk=4, batch_size=8)
    bundle.warmup(event_widths=(16,), explicit_values=True)
    before = serving_mod._serve_step_events._cache_size()
    bundle.recommend_events([[1, 2, 3], list(range(10))])   # width 16
    bundle.recommend_events(
        [{i: float(2 + i % 3) for i in range(9)}])          # explicit, w16
    assert serving_mod._serve_step_events._cache_size() == before
    bundle.recommend_events([list(range(20))])              # width 32: new
    assert serving_mod._serve_step_events._cache_size() == before + 1


def test_event_ids_out_of_range_rejected(trained_model):
    """Out-of-range ids must raise rather than silently wrap in the
    compact (int16) wire encoding."""
    bundle = ServingBundle.from_model(trained_model, topk=3, batch_size=4)
    with pytest.raises(ValueError, match="out-of-range"):
        bundle.recommend_events([[0, bundle.n_items]])
    with pytest.raises(ValueError, match="out-of-range"):
        bundle.recommend_events([{-1: 2.0}])


@pytest.fixture(scope="module")
def trained_coffee():
    from polara_tpu.models.coffee import CoffeeModel
    events = make_synthetic_interactions(n_users=80, n_items=50,
                                         n_events=1500, seed=3)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()
    model = CoffeeModel(data)
    model.mlrank = (8, 6, 3)
    model.verbose = False
    model.seed = 0
    model.build()
    return model


def test_coffee_bundle_matches_model_scoring(trained_coffee):
    # VERDICT r2 weak #8: CoFFee's scoring collapses to proj @ panel.T
    # (models/coffee.py:142-154) so from_model must be able to bundle it
    model = trained_coffee
    bundle = ServingBundle.from_model(model, topk=5, batch_size=16)
    assert bundle.value_map is not None
    bundle.warmup()

    # serve the test users' raw-rating profiles through the bundle and
    # compare with the model's own recommendation pipeline
    holdout_users = model.data.test.holdout["userid"].nunique()
    testset = model.data.test.testset \
        if model.data.test.testset is not None else None
    if testset is None:
        testset = model.data._recover_testset()
    events = []
    for _, grp in testset.groupby("userid", sort=True):
        events.append(dict(zip(grp["movieid"].tolist(),
                               grp["rating"].tolist())))
    recs = bundle.recommend_events(events)
    assert recs.shape == (holdout_users, 5)

    saved_topk = model.topk
    model.topk = 5
    try:
        expect = model.recommendations
    finally:
        model.topk = saved_topk
    agreement = (recs == expect).mean()
    assert agreement > 0.999, agreement


def test_coffee_bundle_dense_profiles_and_roundtrip(trained_coffee,
                                                    tmp_path):
    model = trained_coffee
    bundle = ServingBundle.from_model(model, topk=4, batch_size=8)
    profiles, _ = model.get_test_matrix()
    dense = np.asarray(profiles)[:6]
    before = bundle.recommend(dense)     # routed through the event path
    assert before.shape == (6, 4)
    # seen filtering held even for negatively weighted (low) ratings
    for row, rec in zip(dense, before):
        assert not (set(np.nonzero(row)[0]) & set(rec))

    path = str(tmp_path / "coffee_bundle.npz")
    bundle.save(path)
    restored = ServingBundle.load(path)
    assert restored.value_map == bundle.value_map
    assert restored.default_weight == bundle.default_weight
    np.testing.assert_array_equal(restored.recommend(dense), before)


def test_coffee_bundle_rejects_unknown_rating(trained_coffee):
    bundle = ServingBundle.from_model(trained_coffee, topk=4, batch_size=8)
    with pytest.raises(ValueError, match="absent from the trained"):
        bundle.recommend_events([{1: 99.0}])


# --------------------------------------------------------------------------
# value-map semantics regressions (round-3 review findings)
# --------------------------------------------------------------------------

def _manual_event_topk(factors, events_weights, topk):
    """Numpy oracle for the event path: score = sum_e w_e * F[e] @ F.T,
    seen events masked to -inf."""
    out = []
    for ev in events_weights:
        proj = sum(w * np.asarray(factors)[i] for i, w in ev.items())
        scores = proj @ np.asarray(factors).T
        for i in ev:
            scores[i] = -np.inf
        out.append(np.argsort(-scores, kind="stable")[:topk])
    return np.asarray(out, np.int32)


@pytest.fixture(scope="module")
def vm_bundle_factors():
    rs = np.random.RandomState(11)
    return rs.randn(40, 6).astype(np.float32)


def test_value_map_explicit_low_rating_not_collapsed(vm_bundle_factors):
    """An explicit 1.0 rating under a value_map must use the 1.0-level
    weight (here negative), never the implicit default (top level)."""
    factors = vm_bundle_factors
    bundle = ServingBundle(factors, topk=5, batch_size=4,
                           value_map={1.0: -2.0, 5.0: 3.0},
                           default_weight=3.0)
    got = bundle.recommend_events([{7: 1.0}])
    want = _manual_event_topk(factors, [{7: -2.0}], 5)
    np.testing.assert_array_equal(got, want)
    # and the implicit form of the same item uses the default weight
    got_impl = bundle.recommend_events([[7]])
    want_impl = _manual_event_topk(factors, [{7: 3.0}], 5)
    np.testing.assert_array_equal(got_impl, want_impl)


def test_value_map_mixed_dict_and_list_requests(vm_bundle_factors):
    """Item-id lists in a mixed batch are implicit: they take
    default_weight even when 1.0 is not a trained level."""
    factors = vm_bundle_factors
    bundle = ServingBundle(factors, topk=5, batch_size=4,
                           value_map={2.0: -1.0, 5.0: 2.5},
                           default_weight=2.5)
    got = bundle.recommend_events([{3: 2.0}, [8, 9]])
    want = _manual_event_topk(
        factors, [{3: -1.0}, {8: 2.5, 9: 2.5}], 5)
    np.testing.assert_array_equal(got, want)


def test_value_map_f32_inexact_levels_roundtrip(vm_bundle_factors,
                                                tmp_path):
    """Levels not exactly representable in f32 (0.1) must match request
    values (f32 wire) and survive a save/load round-trip."""
    factors = vm_bundle_factors
    bundle = ServingBundle(factors, topk=4, batch_size=4,
                           value_map={0.1: 2.0, 0.2: -1.0},
                           default_weight=2.0)
    got = bundle.recommend_events([{5: 0.1, 6: 0.2}])
    want = _manual_event_topk(factors, [{5: 2.0, 6: -1.0}], 4)
    np.testing.assert_array_equal(got, want)

    path = str(tmp_path / "vm_bundle.npz")
    bundle.save(path)
    restored = ServingBundle.load(path)
    np.testing.assert_array_equal(
        restored.recommend_events([{5: 0.1, 6: 0.2}]), got)


# --------------------------------------------------------------------------
# Implicit-MF fold-in serving (iALS / BPR warm-start semantics)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def warm_start_data():
    events = make_synthetic_interactions(n_users=90, n_items=40,
                                         n_events=1800, seed=3)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = True
    data.test_ratio = 0.2
    data.holdout_size = 2
    data.prepare()
    return data


def _warm_profiles(model):
    profiles, _, __ = model._warm_start_profiles()
    return np.asarray(profiles)


def test_ials_bundle_serves_fold_in_semantics(warm_start_data):
    import jax.numpy as jnp
    from polara_tpu.models.implicit_mf import ImplicitALS

    model = ImplicitALS(warm_start_data)
    model.verbose = False
    model.rank = 8
    model.num_epochs = 6
    model.compute_dtype = jnp.float64
    model.build()
    expect = model.recommendations        # warm-start fold-in path

    bundle = ServingBundle.from_model(model, batch_size=32,
                                      dtype=jnp.float64)
    assert bundle.fold_in["kind"] == "ials"
    got = bundle.recommend(_warm_profiles(model))
    agree = (got == expect).mean()
    assert agree > 0.97, agree

    # projection serving (the old behavior) is NOT fold-in: it must
    # disagree materially, otherwise this test guards nothing
    proj = ServingBundle(model.factors["movieid"], topk=model.topk,
                         dtype=jnp.float64, batch_size=32)
    assert (proj.recommend(_warm_profiles(model)) == expect).mean() < 0.9


def test_ials_bundle_event_path_matches_dense(warm_start_data):
    import jax.numpy as jnp
    from polara_tpu.models.implicit_mf import ImplicitALS

    model = ImplicitALS(warm_start_data)
    model.verbose = False
    model.rank = 6
    model.num_epochs = 4
    model.weight_func = np.sqrt          # maps to the named "sqrt"
    model.build()
    bundle = ServingBundle.from_model(model, batch_size=16,
                                      dtype=jnp.float64)
    assert bundle.fold_in["weight"] == "sqrt"

    profiles = _warm_profiles(model)[:8]
    dense_recs = bundle.recommend(profiles)
    events = []
    for row in profiles:
        cols = np.nonzero(row)[0]
        events.append({int(c): float(row[c]) for c in cols})
    event_recs = bundle.recommend_events(events)
    assert (event_recs == dense_recs).mean() > 0.97


def test_bpr_bundle_serves_ridge_fold_in(warm_start_data):
    import jax.numpy as jnp
    from polara_tpu.models.implicit_mf import ImplicitBPR

    model = ImplicitBPR(warm_start_data)
    model.verbose = False
    model.rank = 6
    model.num_epochs = 10
    model.build()
    expect = model.recommendations

    bundle = ServingBundle.from_model(model, batch_size=32,
                                      dtype=jnp.float64)
    assert bundle.fold_in == {"kind": "ridge",
                              "reg": model.regularization}
    got = bundle.recommend(_warm_profiles(model))
    assert (got == expect).mean() > 0.97


def test_fold_in_bundle_save_load_roundtrip(warm_start_data, tmp_path):
    import jax.numpy as jnp
    from polara_tpu.models.implicit_mf import ImplicitALS

    model = ImplicitALS(warm_start_data)
    model.verbose = False
    model.rank = 6
    model.num_epochs = 3
    model.weight_func = "sqrt"
    model.build()
    bundle = ServingBundle.from_model(model, batch_size=8)
    profiles = _warm_profiles(model)[:5]
    before = bundle.recommend(profiles)

    path = str(tmp_path / "ials_bundle.npz")
    bundle.save(path)
    restored = ServingBundle.load(path)
    assert restored.fold_in == bundle.fold_in
    np.testing.assert_array_equal(restored.recommend(profiles), before)

    # a custom callable weight cannot persist — clear error, not silence
    bundle.fold_in["weight"] = lambda x: x
    with pytest.raises(ValueError, match="callable"):
        bundle.save(str(tmp_path / "bad.npz"))


def test_fold_in_rejects_value_map_combination():
    with pytest.raises(ValueError, match="mutually exclusive"):
        ServingBundle(np.eye(4), fold_in={"kind": "ials"},
                      value_map={1.0: 1.0})
