"""ML-10M-scale quality reproduction artifact (once-per-round background
run; extends the ML-1M artifact to the reference's second published
table).

The reference's CV tutorial reports fold-wise HR / MRR / coverage on real
ML-10M for the tuned models (``/root/reference/examples/Hyper-parameter
tuning and cross-validation tutorial.ipynb`` cell 92; BASELINE.md):

    fold 1   PureSVD     0.076857  0.029101  0.085902
             PureSVD-s   0.084729  0.032221  0.148946
             iALS        0.076428  0.028240  0.093489

with tuned configs PureSVD-s = (col_scaling 0.6, rank 130) and iALS =
(alpha 0.3, epsilon 0.3, sqrt confidence, reg 0.03, rank 60) [notebook
cells 61, 77].  With no network egress the calibrated generator at the
exact ML-10M geometry is the sanctioned substitute workload.  This run
drives a 5-fold CV of PureSVD / PureSVD-s / iALS at those configs through
OUR stack (TPU) and checks the published *structure* of the table:

* PureSVD-s beats PureSVD on HR, MRR and coverage on every fold (the
  tutorial's headline finding);
* iALS lands in the same quality family as PureSVD (HR within 25%);
* optionally (``ML10M_IDENTITY=1``, default on) fold-1 PureSVD
  recommendation identity >= 99.9% vs the actual reference (ARPACK
  svds + numba-stubbed import) at this scale — the ML-1M identity gate
  promoted to 10M events.  The reference stage is host-bound (pandas +
  f64 ARPACK on a heavily throttled CPU), so by default it runs on a
  seeded user subset (``ML10M_IDENTITY_FRACTION``, default 0.1 — all
  events of 10% of users, ~1M events); set it to 1.0 for the full-scale
  gate.  ``ML10M_IDENTITY_FROM=<file>`` merges a pre-computed identity
  JSON (from a standalone ``ML10M_STAGE=identity`` run) instead of
  re-running the subprocess — this lets the CPU-only identity stage run
  in the background while the TPU is busy elsewhere.

Deviation: the tutorial holds out each test user's LATEST item
(``custom_order='timestamp'``, ``random_holdout=False``).  The calibrated
workload carries no timestamps, so both sides here use seeded random
holdout — the holdout rule is identical across everything compared.

Run from the repo root:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quality_ml10m.py

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

from polara_tpu.runtime.timing import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from polara_tpu.data import RecommenderData  # noqa: E402
from polara_tpu.datasets.synthetic import load_or_make_ml10m  # noqa: E402
from polara_tpu.models import ImplicitALS, ScaledSVD, SVDModel  # noqa: E402

# reference notebook cell 92 (real ML-10M, fold 1)
PUBLISHED_FOLD1 = {
    "PureSVD": {"hr": 0.076857, "mrr": 0.029101, "coverage": 0.085902},
    "PureSVD-s": {"hr": 0.084729, "mrr": 0.032221, "coverage": 0.148946},
    "iALS": {"hr": 0.076428, "mrr": 0.028240, "coverage": 0.093489},
}
FOLDS = (1, 2, 3, 4, 5)
PSVD_RANK = 50          # the bench rank; the tutorial's tuned value is unpublished
SSVD_CONFIG = {"col_scaling": 0.6, "rank": 130}      # notebook cell 61
IALS_CONFIG = {"alpha": 0.3, "epsilon": 0.3, "regularization": 0.03,
               "rank": 60}                           # notebook cell 77


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_models(data):
    psvd = SVDModel(data)
    psvd.rank = PSVD_RANK
    ssvd = ScaledSVD(data)
    ssvd.col_scaling = SSVD_CONFIG["col_scaling"]
    ssvd.rank = SSVD_CONFIG["rank"]
    ials = ImplicitALS(data)
    for name, value in IALS_CONFIG.items():
        setattr(ials, name, value)
    ials.weight_func = jnp.sqrt                      # notebook: np.sqrt
    models = {"PureSVD": psvd, "PureSVD-s": ssvd, "iALS": ials}
    for model in models.values():
        model.verbose = False
    return models


def main():
    rows, cols, vals = load_or_make_ml10m(log=log)
    order = np.random.RandomState(99).permutation(len(rows))
    events = pd.DataFrame({
        "userid": rows[order].astype(np.int64) * 7 + 10_001,
        "movieid": cols[order].astype(np.int64) * 3 + 501,
        "rating": vals[order].astype(np.int64)})
    log(f"events: {len(events)} at ML-10M geometry "
        f"({events['userid'].nunique()}x{events['movieid'].nunique()})")

    if os.environ.get("ML10M_STAGE") == "identity":
        # subprocess mode: CPU/x64 backend, identity gate only
        print(json.dumps(identity_check(events)))
        return

    data = RecommenderData(events.copy(), "userid", "movieid", "rating",
                           seed=0, verbose=False)
    # tutorial cell 22 settings (holdout rule deviation documented above)
    data.warm_start = False
    data.holdout_size = 1
    data.test_ratio = 0.2
    data.permute_tops = False
    data.random_holdout = True
    models = build_models(data)

    scores = {name: {"hr": [], "mrr": [], "coverage": []}
              for name in models}
    for fold in FOLDS:
        t0 = time.perf_counter()
        data.test_fold = fold
        data.update()
        for name, model in models.items():
            rel, rank, exp = model.evaluate(
                ["relevance", "ranking", "experience"], topk=10)
            scores[name]["hr"].append(float(rel.hr))
            scores[name]["mrr"].append(float(rank.mrr))
            scores[name]["coverage"].append(float(exp.coverage))
        log(f"fold {fold}: " + " ".join(
            f"{n} hr={scores[n]['hr'][-1]:.4f}" for n in models)
            + f" ({time.perf_counter() - t0:.1f}s)")

    table = {name: {m: round(float(np.mean(v)), 6)
                    for m, v in by_m.items()}
             for name, by_m in scores.items()}
    fold1 = {name: {m: round(v[0], 6) for m, v in by_m.items()}
             for name, by_m in scores.items()}

    # the tutorial's headline finding must reproduce per fold
    for i, fold in enumerate(FOLDS):
        for metric in ("hr", "mrr", "coverage"):
            assert scores["PureSVD-s"][metric][i] \
                > scores["PureSVD"][metric][i], \
                f"fold {fold}: PureSVD-s did not beat PureSVD on {metric}"
    assert abs(table["iALS"]["hr"] - table["PureSVD"]["hr"]) \
        <= 0.25 * table["PureSVD"]["hr"], \
        "iALS fell out of the PureSVD quality family"

    payload = {
        "metric": "ml10m_quality_cv_hr10_puresvd_s",
        "value": table["PureSVD-s"]["hr"],
        "unit": "hr@10",
        "vs_baseline": round(table["PureSVD-s"]["hr"]
                             / PUBLISHED_FOLD1["PureSVD-s"]["hr"], 3),
        "folds": len(FOLDS),
        "table_mean": table,
        "table_fold1": fold1,
        "published_real_ml10m_fold1": PUBLISHED_FOLD1,
        "scaled_beats_pure_all_folds": True,
    }

    if os.environ.get("ML10M_IDENTITY", "1") != "0":
        # the identity stage is host-bound and slow; keep the CV table
        # recoverable from the log if it dies mid-flight
        log("cv-table (pre-identity): " + json.dumps(payload))
        precomputed = os.environ.get("ML10M_IDENTITY_FROM")
        if precomputed:
            with open(precomputed) as fh:
                identity = json.loads(
                    fh.read().strip().splitlines()[-1])
        else:
            # f64 parity needs the CPU/x64 backend (the ML-1M gate's
            # regime; f32 TPU factors top out near the bench's 99.8%
            # top-10 overlap vs exact, below the 99.9% identity bar) —
            # run it in a subprocess so the CV stage keeps the session
            # backend
            import subprocess
            env = dict(os.environ, ML10M_STAGE="identity",
                       JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True)
            sys.stderr.write(out.stderr)
            if out.returncode:
                raise RuntimeError(f"identity stage failed:\n{out.stdout}")
            identity = json.loads(out.stdout.strip().splitlines()[-1])
        assert identity["agreement"] >= 0.999, identity
        # name the payload key honestly: a seeded user subset certifies a
        # sampled regime, not the full 10M-event one (ADVICE r04)
        key = ("svd_identity_fold1"
               if identity.get("user_fraction", 1.0) >= 1.0
               else "svd_identity_fold1_sampled")
        payload[key] = identity

    print(json.dumps(payload))


def identity_check(events):
    """Fold-1 PureSVD recommendation identity vs the actual reference at
    ML-10M scale (ARPACK svds rank 50; reference import numba-stubbed).

    The reference side is pure host pandas + f64 ARPACK on a heavily
    throttled CPU; ``ML10M_IDENTITY_FRACTION`` (default 0.1) bounds that
    cost by keeping all events of a seeded fraction of users — both
    sides see the identical sub-frame, so the identity comparison stays
    exact apples-to-apples.  1.0 runs the full-scale gate."""
    import test_reference_parity as refshim

    fraction = float(os.environ.get("ML10M_IDENTITY_FRACTION", "0.1"))
    if fraction < 1.0:
        users = events["userid"].unique()
        keep_n = max(1, int(round(len(users) * fraction)))
        keep = pd.Index(np.random.RandomState(1234)
                        .permutation(users)[:keep_n])
        events = events[events["userid"].isin(keep)]
        log(f"identity stage: seeded {fraction:.0%} user subset — "
            f"{keep_n} users, {len(events)} events")

    log("identity stage: preparing reference data model (host pandas; "
        "slow on the throttled CPU)")
    t0 = time.perf_counter()
    ref_data = refshim.ref_data_mod.RecommenderData(
        events.copy(), "userid", "movieid", "rating", seed=0)
    ref_data.verbose = False
    for name, value in (("warm_start", False), ("holdout_size", 1),
                        ("test_ratio", 0.2), ("permute_tops", False),
                        ("random_holdout", True), ("test_fold", 1)):
        setattr(ref_data, name, value)
    ref_svd = refshim.ref_models_mod.SVDModel(ref_data)
    ref_svd.rank = PSVD_RANK
    ref_svd.verbose = False
    ref_recs = np.asarray(ref_svd.recommendations)
    log(f"reference fold-1 recommendations: "
        f"{time.perf_counter() - t0:.0f}s")

    our_data = RecommenderData(events.copy(), "userid", "movieid",
                               "rating", seed=0, verbose=False)
    for name, value in (("warm_start", False), ("holdout_size", 1),
                        ("test_ratio", 0.2), ("permute_tops", False),
                        ("random_holdout", True), ("test_fold", 1)):
        setattr(our_data, name, value)
    our_svd = SVDModel(our_data)
    our_svd.rank = PSVD_RANK
    our_svd.verbose = False
    our_svd.compute_dtype = jnp.float64   # ARPACK-grade subspace regime
    our_recs = np.asarray(our_svd.recommendations)

    agreement = float((ref_recs == our_recs).mean())
    log(f"fold-1 identity at ML-10M geometry "
        f"({len(events)} events): {agreement:.4%}")
    assert agreement >= 0.999, \
        f"fold-1 SVD rec identity {agreement:.4%} < 99.9%"
    return {"agreement": round(agreement, 6),
            "user_fraction": fraction,
            "n_events": int(len(events)),
            "n_test_users": int(ref_recs.shape[0])}


if __name__ == "__main__":
    main()
