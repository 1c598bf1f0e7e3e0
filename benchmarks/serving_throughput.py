"""Online-serving throughput at ML-10M catalog scale.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serving_throughput.py

Note: through the axon tunnel, always force a host copy in timing loops
and vary an input element per iteration (see CLAUDE.md).
Prints ONE JSON line on stdout (progress on stderr).  The reference has
no serving layer, so there is no baseline to beat — vs_baseline is null.
"""
import json
import sys
import time

import numpy as np

from polara_tpu.runtime.serving import ServingBundle

N_ITEMS, RANK, BATCH = 10_677, 50, 1024


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    rs = np.random.RandomState(0)
    factors = rs.randn(N_ITEMS, RANK).astype(np.float32)
    bundle = ServingBundle(factors, topk=10, batch_size=BATCH)
    bundle.warmup()

    events = [rs.choice(N_ITEMS, 100, replace=False).tolist()
              for _ in range(BATCH)]
    bundle.recommend_events(events)  # request-path warm-up
    timings = []
    for i in range(20):
        events[0][0] = i  # defeat remote-computation dedupe
        t0 = time.perf_counter()
        bundle.recommend_events(events)
        timings.append(time.perf_counter() - t0)
    latency = min(timings)
    log(f"event-path batch-{BATCH} latency: {latency * 1e3:.1f} ms "
        f"-> {BATCH / latency:,.0f} users/sec")

    print(json.dumps({
        "metric": f"serving_batch{BATCH}_event_path_latency",
        "value": round(latency * 1e3, 3),
        "unit": "ms",
        "vs_baseline": None,
        "users_per_sec": round(BATCH / latency),
    }))


if __name__ == "__main__":
    main()
