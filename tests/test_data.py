import numpy as np
import pandas as pd
import pytest

from polara_tpu.data import RecommenderData, EventNotifier, Scenario


def make_data(df, **kwargs):
    kwargs.setdefault("verbose", False)
    return RecommenderData(df, "userid", "movieid", "rating", **kwargs)


def test_duplicates_rejected(tiny_timeline):
    dup = pd.concat([tiny_timeline, tiny_timeline.iloc[[0]]],
                    ignore_index=True)
    with pytest.raises(ValueError):
        make_data(dup)


def test_default_split_is_warm_start(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    training = data.training
    assert data._state == Scenario.WARM_START
    # train and test users must be disjoint in the ORIGINAL id space
    test_users_old = set()
    user_test_index = data.index.userid.test
    if user_test_index is not None:
        test_users_old = set(user_test_index["old"])
    train_users_old = set(data.index.userid.training["old"])
    assert not (test_users_old & train_users_old)
    # contiguous internal ids
    assert training["userid"].max() + 1 == training["userid"].nunique()
    assert training["movieid"].max() + 1 == training["movieid"].nunique()


def test_known_users_scenario(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    training = data.training
    assert data._state == Scenario.KNOWN_USERS
    holdout = data.test.holdout
    # holdout users are part of the training user index
    assert holdout["userid"].isin(
        data.index.userid.training["new"]).all()
    # holdout rows are excluded from training
    merged = training.merge(holdout, on=["userid", "movieid"], how="inner")
    assert merged.empty


def test_holdout_is_top_rated(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    data.holdout_size = 1
    data.update()
    holdout = data.test.holdout
    assert (holdout.groupby("userid").size() == 1).all()
    # each holdout item carries the user's max rating among eligible rows
    df = data._data
    for _, row in holdout.iterrows():
        old_user = data.index.userid.training.set_index("new").loc[
            row["userid"], "old"]
        user_rows = df[df["userid"] == old_user]
        assert row["rating"] == user_rows["rating"].max()


def test_holdout_size_filters_short_sessions(tiny_timeline):
    data = make_data(tiny_timeline, seed=0)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 2
    data.update()
    holdout = data.test.holdout
    # user 2 has a single interaction -> cannot produce a 2-item holdout
    assert (holdout.groupby("userid").size() == 2).all()


def test_random_holdout_seeded(synthetic_interactions):
    data1 = make_data(synthetic_interactions, seed=99)
    data1.random_holdout = True
    data2 = make_data(synthetic_interactions, seed=99)
    data2.random_holdout = True
    pd.testing.assert_frame_equal(data1.test.holdout, data2.test.holdout)


def test_change_fold_changes_test_users(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    users_fold5 = set(data.test.holdout["userid"].unique())
    old_fold5 = set(data.index.userid.test["old"])
    data.test_fold = 1
    data.update()
    old_fold1 = set(data.index.userid.test["old"])
    assert old_fold1 and old_fold1 != old_fold5


def test_on_change_and_on_update_events(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.update()

    class Listener:
        def __init__(self):
            self.changes = 0
            self.updates = 0

        def on_change(self):
            self.changes += 1

        def on_update(self):
            self.updates += 1

    listener = Listener()
    data.subscribe(data.on_change_event, listener.on_change)
    data.subscribe(data.on_update_event, listener.on_update)

    data.holdout_size = 5  # warm start: test-only update
    data.update()
    assert (listener.changes, listener.updates) == (0, 1)

    data.test_fold = 2  # moves the fold: full update
    data.update()
    assert (listener.changes, listener.updates) == (1, 1)


def test_to_coo_roundtrip(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    idx, val, shp = data.to_coo()
    assert idx.shape[1] == 2
    assert val.shape[0] == idx.shape[0] == data.training.shape[0]
    assert shp[0] == data.training["userid"].nunique()
    assert shp[1] == data.training["movieid"].nunique()


def test_to_coo_tensor_mode(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    idx, val, shp = data.to_coo(tensor_mode=True)
    assert idx.shape[1] == 3
    assert len(shp) == 3
    assert shp[2] == data.index.feedback.shape[0]
    assert (val == 1).all()
    # feedback codes sorted by rating value
    fb = data.index.feedback
    assert fb.sort_values("old")["new"].is_monotonic_increasing


def test_test_to_coo_sorted_users(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    users, items, feedback = data.test_to_coo()
    assert (np.diff(users) >= 0).all()
    n_users, n_items = data.get_test_shape()
    assert users.max() + 1 <= n_users
    assert items.max() < n_items


def test_state3_testset_recovery(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    data.update()
    users, items, feedback = data.test_to_coo()
    holdout_users = data.test.holdout["userid"].unique()
    assert set(np.unique(users)) <= set(
        data.index.userid.training["new"])


def test_set_test_data_holdout_only(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.warm_start = False
    data.update()
    # craft an external holdout in ORIGINAL id space
    df = synthetic_interactions
    external = df.groupby("userid").tail(1).copy()
    data.set_test_data(holdout=external, warm_start=False)
    holdout = data.test.holdout
    # items must be remapped to internal ids
    assert holdout["movieid"].max() < data.index.itemid.shape[0]


def test_prepare_training_only(synthetic_interactions):
    data = make_data(synthetic_interactions, seed=0)
    data.prepare_training_only()
    assert data._state == Scenario.TRAIN_ONLY
    assert data.test.holdout is None
    assert data.test.testset is None
    assert data.training.shape[0] == synthetic_interactions.shape[0]


def test_event_notifier_weakref():
    notifier = EventNotifier(["ping"])

    class Listener:
        hits = 0

        def cb(self):
            Listener.hits += 1

    keep = Listener()
    gone = Listener()
    notifier.subscribe("ping", keep.cb)
    notifier.subscribe("ping", gone.cb)
    del gone
    notifier.notify("ping")
    assert Listener.hits == 1


def test_long_tail_mixin_restricts_holdout():
    import numpy as np
    from polara_tpu.data import LongTailMixin, RecommenderData
    from polara_tpu.datasets import make_synthetic_interactions

    class LongTailData(LongTailMixin, RecommenderData):
        pass

    events = make_synthetic_interactions(n_users=60, n_items=40,
                                         n_events=1200,
                                         popularity_skew=1.5, seed=0)
    data = LongTailData(events, "userid", "movieid", "rating",
                        long_tail_holdout=True, head_feedback_frac=0.3,
                        seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()

    popularity = events["movieid"].value_counts(normalize=True)
    head_raw = set(popularity.index[popularity.cumsum() <= 0.3])
    item_map = data.get_entity_index("movieid").set_index("new")["old"]
    holdout_raw = set(item_map.loc[data.test.holdout["movieid"]].values)
    assert not (holdout_raw & head_raw)
    # head items are still present in training
    training_raw = set(item_map.loc[data.training["movieid"]].values)
    assert head_raw <= training_raw


def test_custom_order_holdout_selects_latest():
    import numpy as np
    from polara_tpu.data import RecommenderData
    from polara_tpu.datasets import make_synthetic_interactions

    events = make_synthetic_interactions(n_users=40, n_items=30,
                                         n_events=800, include_time=True,
                                         seed=4)
    data = RecommenderData(events, "userid", "movieid", "rating",
                           custom_order="timestamp", seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.prepare()

    holdout = data.test.holdout
    assert "timestamp" in holdout.columns
    # the held-out event is each user's latest one
    user_map = data.get_entity_index("userid").set_index("new")["old"]
    latest = events.groupby("userid")["timestamp"].max()
    for _, row in holdout.iterrows():
        raw_user = user_map.loc[row["userid"]]
        assert row["timestamp"] == latest.loc[raw_user]
    # training rows of each holdout user are strictly earlier or equal
    assert len(holdout) == holdout["userid"].nunique()


def test_fractional_holdout_takes_top_fraction():
    """Regression: fractional holdout must hold out `frac` of each user's
    top-rated items (was inverted via a global-fraction path)."""
    import numpy as np
    import pandas as pd
    from polara_tpu.data import RecommenderData

    rows = [(u, i, ((u + i) % 10) + 1) for u in range(5) for i in range(10)]
    events = pd.DataFrame(rows, columns=["userid", "movieid", "rating"])
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 0.2
    data.prepare()

    holdout = data.test.holdout
    assert len(holdout) == 10  # 20% of 50
    assert holdout.groupby("userid").size().eq(2).all()
    # top-rated items are the held-out ones
    assert (holdout["rating"] >= 9).all()  # each user holds out its two top ratings
    assert len(data.training) == 40


def test_fractional_holdout_zero_rounding_keeps_group():
    """A user whose rounded fraction is 0 items loses nothing."""
    import pandas as pd
    from polara_tpu.data import RecommenderData

    rows = [(0, i, i + 1) for i in range(10)] + [(1, 8, 1), (1, 9, 2)]
    events = pd.DataFrame(rows, columns=["userid", "movieid", "rating"])
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 0.2
    data.prepare()
    holdout = data.test.holdout
    # user 1: round(0.2*2) = 0 -> nothing held out, user keeps training
    assert 1 not in set(
        data.get_entity_index("userid").set_index("new")
        .loc[holdout["userid"].unique(), "old"]
        if len(holdout) else [])
    assert len(holdout) == 2  # only user 0 contributes round(0.2*10)=2


def test_tensor_mode_threshold_filters_by_feedback():
    """Regression: tensor-mode feedback_threshold must act on ratings,
    not the all-ones value vector."""
    import numpy as np
    import pandas as pd
    from polara_tpu.data import RecommenderData

    rows = [(u, i, 1 + (u + i) % 5) for u in range(6) for i in range(8)]
    events = pd.DataFrame(rows, columns=["userid", "movieid", "rating"])
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.prepare_training_only()
    idx, val, shp = data.to_coo(tensor_mode=True, feedback_threshold=4)
    assert len(val) > 0
    assert (val == 1).all()
    # only levels for ratings >= 4 remain, reindexed to 0..k-1
    kept = events[events["rating"] >= 4]
    assert len(idx) == len(kept)
    assert shp[2] == kept["rating"].nunique()


def test_narrow_int32_id_columns_prepare(synthetic_interactions):
    """Regression: int32 id/rating columns must survive reindexing — the
    factorize codes are int64 and pandas>=3 refuses silent downcasts in
    .loc setitem, so the data model uses whole-column assignment."""
    narrow = synthetic_interactions.astype(
        {"userid": np.int32, "movieid": np.int32, "rating": np.int32})
    data = make_data(narrow, seed=0)
    data.warm_start = False
    data.holdout_size = 2
    data.prepare()
    n_items = data.index.itemid.shape[0]
    assert data.training["movieid"].max() + 1 == n_items
    assert data.test.holdout["movieid"].between(0, n_items - 1).all()

    wide = make_data(synthetic_interactions.copy(), seed=0)
    wide.warm_start = False
    wide.holdout_size = 2
    wide.prepare()
    pd.testing.assert_frame_equal(
        data.training.astype(np.int64), wide.training.astype(np.int64))


def test_sample_capped_groups_drops_nan_keys():
    # NaN group keys factorize to code -1; groupby's dropna used to
    # exclude them silently — the vectorized sampler must too, not crash
    # (round-3 review finding)
    import numpy as np
    from polara_tpu.data.dataset import RecommenderData

    codes = np.array([0, -1, 0, 1, -1, 1, 1])
    rs = np.random.RandomState(0)
    picked = RecommenderData._sample_capped_groups(codes, rs, 2)
    assert set(picked) <= {0, 2, 3, 5, 6}      # NaN rows never picked
    assert (codes[picked] >= 0).all()
    # group 0 kept whole (n=2 <= cap), group 1 capped to 2 of 3
    assert (codes[picked] == 0).sum() == 2
    assert (codes[picked] == 1).sum() == 2


def test_inplace_frame_mutation_invalidates_factorize_memo():
    # the events frame is shared with the caller; in-place edits must
    # drop the memoized factorization, not serve stale codes
    import numpy as np
    import pandas as pd
    from polara_tpu.data.dataset import RecommenderData

    events = pd.DataFrame({
        "userid": np.repeat(np.arange(20), 5),
        "movieid": np.tile(np.arange(25), 4),
        "rating": np.ones(100, int)})
    data = RecommenderData(events, "userid", "movieid", "rating",
                           seed=0, verbose=False)
    data.holdout_size = 1
    data.test_ratio = 0.2
    data.prepare()
    before = data.index.itemid["old"].max()

    events["movieid"] += 1000          # in-place remap through the caller
    data.test_fold = 2                 # fold rotation -> full update
    data.prepare()
    after = data.index.itemid["old"].max()
    assert after == before + 1000      # fresh codes, not the stale memo
