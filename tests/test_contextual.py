"""Contextual post-filtering: data mapping + score-boost mixin."""
import numpy as np
import pandas as pd

from polara_tpu.data.contextual import ItemPostFilteringData
from polara_tpu.models.baselines import PopularityModel
from polara_tpu.models.contextual import ItemPostFilteringMixin
from polara_tpu.models.svd import SVDModel


def make_context_dataset(n_users=30, n_items=20, seed=0):
    rs = np.random.RandomState(seed)
    genres = np.array(["action", "comedy", "drama"])
    item_genre = genres[rs.randint(0, len(genres), n_items)]
    rows = []
    for user in range(n_users):
        items = rs.choice(n_items, size=rs.randint(5, 10), replace=False)
        for item in items:
            rows.append((user, item, rs.randint(1, 6), item_genre[item]))
    data = pd.DataFrame(rows,
                        columns=["userid", "movieid", "rating", "genre"])
    mapping = pd.DataFrame({"movieid": np.arange(n_items),
                            "genre": item_genre})
    return data, mapping, item_genre


class ContextSVD(ItemPostFilteringMixin, SVDModel):
    pass


class ContextPopularity(ItemPostFilteringMixin, PopularityModel):
    pass


def make_data(seed=0):
    events, mapping, item_genre = make_context_dataset(seed=seed)
    data = ItemPostFilteringData(events, "userid", "movieid", "rating",
                                 item_context_mapping={"genre": mapping},
                                 seed=seed, verbose=False)
    data.holdout_size = 1
    data.test_ratio = 0.2
    data.prepare()
    return data, item_genre


def test_context_mapping():
    data, item_genre = make_data()
    ctx = data.context_data["genre"]
    user_ctx = ctx["userid"]
    item_ctx = ctx["movieid"]
    assert user_ctx is not None and item_ctx is not None
    # every listed internal item really belongs to the context genre
    item_index = data.get_entity_index("movieid").set_index("new")["old"]
    for genre, internal_items in item_ctx.items():
        for internal in internal_items:
            assert item_genre[item_index.loc[internal]] == genre


def test_upvote_arrays_alignment():
    data, _ = make_data()
    items, valid = data.upvote_arrays()
    holdout = data.test.holdout
    assert items.shape[0] == holdout["userid"].nunique()
    assert valid.any()


def test_contextual_recommendations_respect_context():
    data, item_genre = make_data()
    model = ContextPopularity(data)
    model.verbose = False
    model.filter_seen = False
    recs = model.recommendations

    holdout = data.test.holdout.sort_values("userid")
    item_index = data.get_entity_index("movieid").set_index("new")["old"]
    ctx_items = data.context_data["genre"]["movieid"]
    user_ctx = data.context_data["genre"]["userid"]

    hit_context = 0
    total = 0
    for row, user in enumerate(holdout["userid"].values):
        genre = user_ctx.loc[user]
        allowed = set(ctx_items.loc[genre])
        n_allowed = len(allowed)
        take = min(n_allowed, recs.shape[1])
        # the top-`take` slots must be filled with context items
        top = [r for r in recs[row][:take] if r >= 0]
        total += len(top)
        hit_context += sum(1 for r in top if r in allowed)
    assert total > 0
    assert hit_context == total


def test_contextual_svd_runs_and_evaluates():
    data, _ = make_data(seed=1)
    model = ContextSVD(data)
    model.rank = 6
    model.verbose = False
    scores = model.evaluate("relevance")
    assert np.isfinite(scores.hr)
