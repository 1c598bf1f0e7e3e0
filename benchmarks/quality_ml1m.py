"""ML-1M-scale quality reproduction artifact (once-per-round background
run, VERDICT r2 #3).

The reference's headline table is 5-fold Recall@1/5/10 on real ML-1M
(``/root/reference/README.md:117-123``; 6040x3706, 1M events).  With no
network egress the calibrated generator at the exact ML-1M geometry is
the sanctioned substitute (same substitution as the bench workload).  The
run:

* drives BOTH implementations through a 5-fold CV at this geometry,
  asserting per-fold PureSVD recommendation identity >= 99.9% between the
  actual reference (ARPACK svds, numba-stubbed import) and this framework
  — the test-scale quality gate (``tests/test_reference_parity.py``)
  promoted to the published scale;
* emits the Recall@1/5/10 table for PureSVD / item-to-item / MP / RND
  next to the reference's published real-ML-1M values.

Run from the repo root (reference side is host/ARPACK, ours follows the
session backend):

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quality_ml1m.py

Prints ONE JSON line on stdout (progress on stderr).
"""
import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

# importing the parity-test module installs the numba stub + pandas
# compatibility patches and binds the reference modules
import test_reference_parity as refshim  # noqa: E402

from polara_tpu.data import RecommenderData  # noqa: E402
from polara_tpu.datasets.synthetic import load_or_make_ml1m  # noqa: E402
from polara_tpu.models import (CoffeeModel, CooccurrenceModel,  # noqa: E402
                               PopularityModel, RandomModel, SVDModel)

# reference README.md:117-123 (real ML-1M, 5-fold CV)
PUBLISHED = {
    "PureSVD": {"recall@1": 0.0794, "recall@5": 0.2194,
                "recall@10": 0.3007},
    "item-to-item": {"recall@1": 0.0247, "recall@5": 0.1260,
                     "recall@10": 0.2021},
    "MP": {"recall@1": 0.0178, "recall@5": 0.0866, "recall@10": 0.1385},
    "RND": {"recall@1": 0.000055, "recall@5": 0.0011,
            "recall@10": 0.0020},
}
FOLDS = (1, 2, 3, 4, 5)
TOPKS = (10, 5, 1)      # max first: lower k reuses sliced recommendations
RANK = 10               # the published table's quickstart configuration


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    rows, cols, vals = load_or_make_ml1m(log=log)
    # deterministic shuffle + non-contiguous external ids: fold splits
    # must see an interleaved timeline, and reindexing must do real work
    order = np.random.RandomState(99).permutation(len(rows))
    events = pd.DataFrame({
        "userid": rows[order].astype(np.int64) * 7 + 10_001,
        "movieid": cols[order].astype(np.int64) * 3 + 501,
        "rating": vals[order].astype(np.int64)})
    log(f"events: {len(events)} at ML-1M geometry "
        f"({events['userid'].nunique()}x{events['movieid'].nunique()})")

    config = dict(warm_start=False, test_ratio=0.2, holdout_size=3,
                  permute_tops=False)
    ref_data = refshim.ref_data_mod.RecommenderData(
        events.copy(), "userid", "movieid", "rating", seed=0)
    ref_data.verbose = False
    our_data = RecommenderData(events.copy(), "userid", "movieid",
                               "rating", seed=0, verbose=False)
    for name, value in config.items():
        setattr(ref_data, name, value)
        setattr(our_data, name, value)

    ref_svd = refshim.ref_models_mod.SVDModel(ref_data)
    ref_svd.rank = RANK
    ref_svd.verbose = False
    models = {
        "PureSVD": SVDModel(our_data),
        "CoFFee": CoffeeModel(our_data),
        "item-to-item": CooccurrenceModel(our_data),
        "MP": PopularityModel(our_data),
        "RND": RandomModel(our_data, seed=0),
    }
    models["PureSVD"].rank = RANK
    # the reference tutorial's ML-1M CoFFee configuration
    # (Example_ML1M.ipynb); no published recall row exists for it, so it
    # reports next to the published-model columns without one
    models["CoFFee"].mlrank = (13, 10, 2)
    for model in models.values():
        model.verbose = False

    recalls = {name: {k: [] for k in TOPKS} for name in models}
    identity = []
    for fold in FOLDS:
        t0 = time.perf_counter()
        ref_data.test_fold = fold
        our_data.test_fold = fold
        ref_data.update()
        our_data.update()

        ref_recs = np.asarray(ref_svd.recommendations)
        our_recs = np.asarray(models["PureSVD"].recommendations)
        agreement = float((ref_recs == our_recs).mean())
        identity.append(agreement)
        assert agreement >= 0.999, \
            f"fold {fold}: SVD rec identity {agreement:.4%} < 99.9%"

        for name, model in models.items():
            for k in TOPKS:
                rel = model.evaluate("relevance", topk=k)
                recalls[name][k].append(float(rel.recall))
        log(f"fold {fold}: identity {agreement:.4%}, "
            f"svd recall@10 {recalls['PureSVD'][10][-1]:.4f} "
            f"({time.perf_counter() - t0:.1f}s)")

    table = {name: {f"recall@{k}": round(float(np.mean(vals_k)), 5)
                    for k, vals_k in by_k.items()}
             for name, by_k in recalls.items()}
    # the published ordering must reproduce: personalized > neighborhood-
    # or-popularity > random floor; the tensor model must also clear the
    # popularity bar (reference Example_ML1M.ipynb structure)
    assert table["PureSVD"]["recall@10"] > table["MP"]["recall@10"] \
        > table["RND"]["recall@10"]
    assert table["CoFFee"]["recall@10"] > table["MP"]["recall@10"]

    print(json.dumps({
        "metric": "ml1m_quality_cv_recall10_puresvd",
        "value": table["PureSVD"]["recall@10"],
        "unit": "recall@10",
        "vs_baseline": round(table["PureSVD"]["recall@10"]
                             / PUBLISHED["PureSVD"]["recall@10"], 3),
        "svd_identity_min": round(min(identity), 6),
        "folds": len(FOLDS),
        "table": table,
        "published_real_ml1m": PUBLISHED,
        "sampled_eigenrec": sampled_eigenrec(events),
    }))


def sampled_eigenrec(events):
    """EigenRec sampled-candidate protocol at the published configuration
    (``Reproducing_EIGENREC_results.ipynb`` cells 11-50, BASELINE.md:23):
    random 5-star holdout via ``set_test_data``, each holdout item ranked
    against 999 randomly sampled unseen items, ScaledSVD rank 50 /
    col_scaling 0.5; published real-ML-1M MRR is 0.3130822.  Deviation:
    the notebook hand-rolls per-EVENT candidate sampling over a 1.4%
    fractional holdout (its cells 28/48 bypass the library mixin, whose
    ``compute_holdout_scores`` asserts a fixed holdout size — reference
    ``models.py:1108``); here the protocol runs through the supported
    mixin with one random 5-star event per user, same candidate-set
    semantics.  Asserts the notebook's headline structure —
    popularity-damped scaling beats plain PureSVD."""
    from polara_tpu.data import SampledEvaluationMixin
    from polara_tpu.models.sampled import SampledEvaluationSVDMixin
    from polara_tpu.models.svd import ScaledSVD
    from polara_tpu.preprocessing.dataframes import (
        sample_unseen_interactions)

    class SampledData(SampledEvaluationMixin, RecommenderData):
        pass

    class SampledScaledSVD(SampledEvaluationSVDMixin, ScaledSVD):
        pass

    t0 = time.perf_counter()
    data = SampledData(events.copy(), "userid", "movieid", "rating",
                       seed=0, verbose=False)
    data.warm_start = False
    data.test_ratio = 0
    data.holdout_size = 1
    data.random_holdout = True
    data.prepare()
    data.set_test_data(holdout=data.test.holdout.query("rating == 5"),
                       warm_start=False, reindex=False,
                       ensure_consistency=False, holdout_size=1)

    item_pool = data.get_entity_index("movieid")["old"].values
    unseen = sample_unseen_interactions(
        events, item_pool, n_random=999, random_state=0,
        userid="userid", itemid="movieid")
    data.set_unseen_interactions(unseen, reindex=True)

    mrr = {}
    for scaling in (1.0, 0.5):
        model = SampledScaledSVD(data)
        model.verbose = False
        model.rank = 50
        model.col_scaling = scaling
        mrr[scaling] = float(model.evaluate("ranking",
                                            simple_rates=True).mrr)
    log(f"sampled EigenRec: PureSVD mrr={mrr[1.0]:.4f}, "
        f"ScaledSVD(0.5) mrr={mrr[0.5]:.4f} "
        f"({time.perf_counter() - t0:.1f}s)")
    assert mrr[0.5] > mrr[1.0], \
        "EigenRec scaling did not improve sampled MRR"
    return {"scaled_mrr": round(mrr[0.5], 6),
            "puresvd_mrr": round(mrr[1.0], 6),
            "published_scaled_mrr": 0.3130822,
            "config": {"rank": 50, "col_scaling": 0.5,
                       "n_random": 999, "holdout": "random 1-per-user, 5-star"}}


if __name__ == "__main__":
    main()
