"""Comparing LightFM with (Scaled)HybridSVD in item cold start.

Counterpart of the reference's ``Comparing LightFM with HybridSVD.ipynb``:
items with tag features are held out as cold, each model recommends the
users most likely to engage with every cold item, and the feature-aware
models are tuned and compared on precision / coverage.  The similarity
data model feeds tag-cosine item similarity into HybridSVD; LightFM
consumes the raw tag lists through the adapter's feature stacking.

Without the optional ``lightfm`` package this script falls back to the
journaling fake shipped with the test suite (seeded linear embeddings) —
the point of the fallback rows is the adapter plumbing and the shared
experimental protocol, not LightFM's model quality.
"""
import pathlib
import sys

import numpy as np
import pandas as pd

from polara_tpu.data import ItemColdStartData
from polara_tpu.data.coldstart import ItemColdStartSimilarityData
from polara_tpu.datasets import make_synthetic_interactions
from polara_tpu.evaluation.engine import consolidate_metrics
from polara_tpu.evaluation.pipelines import find_optimal_svd_rank
from polara_tpu.models.coldstart import (ScaledHybridSVDItemColdStart,
                                         ScaledSVDItemColdStart)
from polara_tpu.preprocessing.features import combine_similarity_data


def _ensure_lightfm():
    """Import lightfm, or install the test-suite fake (documented above)."""
    try:
        import lightfm  # noqa: F401
        return "lightfm"
    except ImportError:
        tests_dir = pathlib.Path(__file__).resolve().parent.parent / "tests"
        sys.path.insert(0, str(tests_dir))
        import _fake_lightfm
        _fake_lightfm.install()
        return "fake (seeded linear embeddings)"


def make_tagged_catalog(n_items, seed=0):
    rs = np.random.RandomState(seed)
    tags = [f"tag{i}" for i in range(12)]
    return pd.DataFrame(
        {"tags": [sorted(rs.choice(tags, size=rs.randint(2, 5),
                                   replace=False).tolist())
                  for _ in range(n_items)]},
        index=pd.RangeIndex(n_items))


def main(n_items=180):
    backend = _ensure_lightfm()
    from polara_tpu.models.external.lightfm import LightFMItemColdStart

    events = make_synthetic_interactions(500, n_items, 16_000, seed=7)
    features = make_tagged_catalog(n_items)

    # tag-cosine similarity over the catalog feeds HybridSVD (notebook's
    # combine_similarity_data step)
    similarity = combine_similarity_data(features,
                                         similarity_type="cosine")
    data = ItemColdStartSimilarityData(
        events, "userid", "movieid", "rating", seed=0, verbose=False,
        item_features=features,
        relations_matrices={"movieid": similarity},
        relations_indices={"movieid": features.index})
    data.test_ratio = 0.1
    data.prepare()
    print(f"cold items: {data.index.itemid.cold_start.shape[0]}, "
          f"similarity backend for HybridSVD, LightFM backend: {backend}")

    # --- tune the SVD baselines (rank sweeps reuse one factorization) ---
    svd = ScaledSVDItemColdStart(data)
    svd.col_scaling = 0.4
    svd.verbose = False
    ranks = [10, 20, 30]
    best_rank, svd_scores = find_optimal_svd_rank(
        svd, ranks, "precision", return_scores=True)

    hsvd = ScaledHybridSVDItemColdStart(data)
    hsvd.col_scaling = 0.4
    hsvd.features_weight = 0.9
    hsvd.verbose = False
    hsvd_rank, hsvd_scores = find_optimal_svd_rank(
        hsvd, ranks, "precision", return_scores=True)

    lfm = LightFMItemColdStart(data, item_features=features)
    lfm.rank = 20
    lfm.verbose = False

    svd.rank, hsvd.rank = best_rank, hsvd_rank
    results = {
        f"ScaledSVD (rank {best_rank})": svd.evaluate(),
        f"ScaledHybridSVD (rank {hsvd_rank})": hsvd.evaluate(),
        "LightFM (rank 20)": lfm.evaluate(),
    }
    frame = pd.concat([consolidate_metrics(scores, label)
                       for label, scores in results.items()])
    frame.columns = frame.columns.droplevel(0)  # drop the metric-type level
    cols = [c for c in ("precision", "recall", "coverage")
            if c in frame.columns]
    print(frame[cols].round(4).to_string())


if __name__ == "__main__":
    main()
