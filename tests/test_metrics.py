"""Metric engine vs a deliberately naive per-user oracle implementing the
reference formulas (polara/recommender/evaluation.py) from first principles."""
import numpy as np
import pandas as pd
import pytest

from polara_tpu.evaluation.metrics import (compute_metrics,
                                           get_experience_scores)


def naive_metrics(recs, holdout, switch_positive=None, penalty=0.0,
                  topk=None, alternative=True):
    """Straightforward loops, no sparse tricks."""
    topk = topk or recs.shape[1]
    users = holdout["userid"].unique()
    per_user = {u: holdout[holdout["userid"] == u] for u in users}
    has_split = switch_positive is not None

    rows = dict(hr=[], arhr=[], mrr=[], ap=[], ndcg=[], ndcl=[],
                prec=[], rec=[], miss=[], fall=[], spec=[])
    TP = FP = TN = FN = 0.0
    for row_idx, u in enumerate(users):
        entries = per_user[u]
        rec_row = [r for r in recs[row_idx] if r >= 0]
        ranks = {}
        for _, e in entries.iterrows():
            item = e["movieid"]
            ranks[item] = rec_row.index(item) + 1 if item in rec_row else 0
        pos = {e["movieid"]: e["rating"] for _, e in entries.iterrows()
               if not has_split or e["rating"] >= switch_positive}
        neg = {e["movieid"]: e["rating"] for _, e in entries.iterrows()
               if has_split and e["rating"] < switch_positive}

        pos_hits = {i: r for i, r in ranks.items() if i in pos and r > 0}
        neg_hits = {i: r for i, r in ranks.items() if i in neg and r > 0}

        tp = len(pos_hits)
        n_eval = len(entries)
        if has_split:
            fp = len(neg_hits)
            tn = len(neg) - fp
            fn = len(pos) - tp
            fp_pen = fp + penalty * (len(rec_row) - tp - fp) \
                if penalty > 0 else fp
        else:
            fp = penalty * (len(rec_row) - tp) if penalty > 0 else 0.0
            tn = 0.0
            fn = n_eval - tp
            fp_pen = fp
        TP += tp
        FP += fp_pen
        TN += tn
        FN += fn
        rows["hr"].append(tp)
        rr = [1.0 / r for r in pos_hits.values()]
        rows["arhr"].append(sum(rr))
        rows["mrr"].append(max(rr) if rr else 0.0)
        # MAP
        ap = 0.0
        for i, r in pos_hits.items():
            n_leq = sum(1 for r2 in pos_hits.values() if r2 <= r)
            ap += n_leq / r
        ap /= max(min(n_eval, topk), 1)
        rows["ap"].append(ap)
        # NDCG over positive entries, ideal ranking over all entries
        fb_sorted = sorted(entries["rating"].values, reverse=True)
        ideal_pos_of = {}
        used = set()
        for _, e in entries.iterrows():
            for p, v in enumerate(fb_sorted):
                if p in used:
                    continue
                if v == e["rating"]:
                    ideal_pos_of[e["movieid"]] = p + 1
                    used.add(p)
                    break

        def gain(v):
            return 2.0 ** v - 1 if alternative else v

        dcg = sum(gain(pos[i]) / np.log2(1 + r) for i, r in pos_hits.items())
        idcg = sum(gain(v) / np.log2(1 + ideal_pos_of[i])
                   for i, v in pos.items())
        rows["ndcg"].append(dcg / idcg if dcg > 0 else 0.0)
        if has_split:
            def loss(v):
                shifted = v - switch_positive
                return -(2.0 ** shifted - 1) if alternative else -shifted
            dcl = sum(loss(neg[i]) / np.log2(1 + r)
                      for i, r in neg_hits.items())
            idcl = sum(loss(v) / np.log2(1 + ideal_pos_of[i])
                       for i, v in neg.items())
            rows["ndcl"].append(dcl / idcl if dcl > 0 else 0.0)
        # relevance family
        rows["prec"].append(tp / (tp + fp_pen) if tp > 0 else 0.0)
        rows["rec"].append(tp / (tp + fn) if tp > 0 else 0.0)
        rows["miss"].append(fn / (fn + tp) if fn > 0 else 0.0)
        if has_split:
            rows["fall"].append(fp / (fp + tn) if fp > 0 else 0.0)
            rows["spec"].append(tn / (fp + tn) if tn > 0 else 0.0)

    out = dict(
        hr=np.mean(rows["hr"]), arhr=np.mean(rows["arhr"]),
        mrr=np.mean(rows["mrr"]), map=np.mean(rows["ap"]),
        ndcg=np.mean(rows["ndcg"]),
        precision=np.mean(rows["prec"]), recall=np.mean(rows["rec"]),
        miss_rate=np.mean(rows["miss"]),
        tp=TP, fp=FP, tn=TN, fn=FN)
    if has_split:
        out.update(ndcl=np.mean(rows["ndcl"]), fallout=np.mean(rows["fall"]),
                   specifity=np.mean(rows["spec"]))
    return out


def make_case(seed=0, n_users=25, n_items=50, h=4, k=10):
    rs = np.random.RandomState(seed)
    recs = np.stack([rs.choice(n_items, k, replace=False)
                     for _ in range(n_users)])
    rows = []
    for u in range(n_users):
        items = rs.choice(n_items, h, replace=False)
        for i in items:
            rows.append((u, i, rs.randint(1, 6)))
    holdout = pd.DataFrame(rows, columns=["userid", "movieid", "rating"])
    return recs, holdout


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_oracle_no_split(seed):
    recs, holdout = make_case(seed)
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", not_rated_penalty=1.0)
    expect = naive_metrics(recs, holdout, penalty=1.0)
    for name, val in expect.items():
        assert got[name] == pytest.approx(val, rel=1e-9), name


@pytest.mark.parametrize("seed", [0, 3])
def test_metrics_match_oracle_with_split(seed):
    recs, holdout = make_case(seed)
    sp_threshold = 4
    is_positive = (holdout["rating"] >= sp_threshold).values
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", is_positive=is_positive,
                          switch_positive=sp_threshold,
                          not_rated_penalty=0.0)
    expect = naive_metrics(recs, holdout, switch_positive=sp_threshold)
    for name, val in expect.items():
        assert got[name] == pytest.approx(val, rel=1e-9), name


def test_metrics_with_penalty_and_split():
    recs, holdout = make_case(7)
    sp_threshold = 3
    is_positive = (holdout["rating"] >= sp_threshold).values
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", is_positive=is_positive,
                          switch_positive=sp_threshold,
                          not_rated_penalty=0.5)
    expect = naive_metrics(recs, holdout, switch_positive=sp_threshold,
                           penalty=0.5)
    for name in ("precision", "tp", "fp", "tn", "fn"):
        assert got[name] == pytest.approx(expect[name], rel=1e-9), name


def test_holdout_size_one_hit_rate():
    # single holdout item: hr is the classic hit rate, mrr = arhr
    recs = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    holdout = pd.DataFrame({"userid": [0, 1, 2],
                            "movieid": [2, 0, 9],
                            "rating": [5, 5, 5]})
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", not_rated_penalty=1.0)
    assert got["hr"] == pytest.approx(2 / 3)
    assert got["mrr"] == pytest.approx((1 / 2 + 0 + 1 / 3) / 3)
    assert got["arhr"] == got["mrr"]


def test_pad_const_ignored():
    recs = np.array([[3, -1, -1], [0, 1, -1]])
    holdout = pd.DataFrame({"userid": [0, 1], "movieid": [3, 2],
                            "rating": [5, 5]})
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", not_rated_penalty=1.0)
    assert got["hr"] == pytest.approx(0.5)
    # penalty counts only valid recommendations: user0 has 1 rec (hit),
    # user1 has 2 recs (no hit)
    assert got["fp"] == pytest.approx(2.0)


def test_coverage():
    recs = np.array([[0, 1], [1, 2], [2, -1]])
    cov = get_experience_scores(recs, total=10)
    assert cov.coverage == pytest.approx(3 / 10)


def test_fused_coverage_excludes_out_of_range_ids():
    # an id >= coverage_total must be excluded, not clipped onto the last
    # catalog item (ADVICE r2: clip would silently count item total-1)
    recs = np.array([[0, 7], [1, -1]])   # 7 is beyond the 4-item catalog
    holdout = pd.DataFrame({"userid": [0, 1], "movieid": [0, 1],
                            "rating": [5, 5]})
    got = compute_metrics(recs, holdout, "userid", "movieid",
                          feedback="rating", coverage_total=4)
    assert got["coverage"] == pytest.approx(2 / 4)


def test_family_accessors_memoize_single_fused_pass(monkeypatch):
    from polara_tpu.evaluation import metrics as m

    recs = np.array([[0, 1], [2, 3]])
    holdout = pd.DataFrame({"userid": [0, 1], "movieid": [1, 2],
                            "rating": [5, 4]})
    calls = {"n": 0}
    real = m.compute_metrics

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(m, "compute_metrics", counting)
    r1 = m.get_ranking_scores(recs, holdout, "userid", "movieid",
                              feedback="rating")
    r2 = m.get_relevance_scores(recs, holdout, "userid", "movieid",
                                feedback="rating")
    h = m.get_hits(recs, holdout, "userid", "movieid", feedback="rating")
    assert calls["n"] == 1          # one fused pass for all three families
    assert r1.ndcg > 0 and r2.recall > 0 and h.true_positive == 2

    # different kwargs are a different computation — no stale hit
    m.get_ranking_scores(recs, holdout, "userid", "movieid",
                         feedback="rating", not_rated_penalty=1.0)
    assert calls["n"] == 2
    # a different recs object misses the memo too
    m.get_ranking_scores(recs.copy(), holdout, "userid", "movieid",
                         feedback="rating", not_rated_penalty=1.0)
    assert calls["n"] == 3


def test_family_accessors_detect_inplace_mutation():
    """In-place edits to a recommendations panel between family calls
    must recompute, not serve the pre-mutation result (round-3 review
    finding: the memo keys host arrays by identity + content sample)."""
    from polara_tpu.evaluation import metrics as m

    recs = np.array([[0, 1], [2, 3]])
    holdout = pd.DataFrame({"userid": [0, 1], "movieid": [1, 2],
                            "rating": [5, 4]})
    before = m.get_hr_score(recs, holdout, "userid", "movieid",
                            feedback="rating")
    recs[1] = [-1, -1]          # same object, different content
    after = m.get_hr_score(recs, holdout, "userid", "movieid",
                           feedback="rating")
    assert before.hr == pytest.approx(1.0)
    assert after.hr == pytest.approx(0.5)


def test_family_accessors_accept_series_kwargs():
    """A pandas Series kwarg (elementwise ``==``) must not break the
    memo-key comparison on the second call (round-3 review finding)."""
    from polara_tpu.evaluation import metrics as m

    recs = np.array([[0, 1], [2, 3]])
    holdout = pd.DataFrame({"userid": [0, 1], "movieid": [1, 2],
                            "rating": [5, 2]})
    first = m.get_ranking_scores(
        recs, holdout, "userid", "movieid", feedback="rating",
        is_positive=(holdout["rating"] >= 4))
    second = m.get_ranking_scores(
        recs, holdout, "userid", "movieid", feedback="rating",
        is_positive=(holdout["rating"] >= 4))   # fresh Series object
    assert first.ndcg == second.ndcg and first.map == second.map
