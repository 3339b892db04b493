"""Interleaved A/B: multimodal_image_decode_resize wall seconds vs the
width the narrow payload frame is repartitioned to (guide §2.3/§4 —
per-task fixed cost vs parallelism for the per-row Python codec).

Patches catalog.widen_if_narrow's repartition target (the function is
imported inside the query body, so patching the module attribute takes
effect per call) and alternates widths within ONE warm session so
ambient host noise hits every variant equally.

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/probe_decode_width.py 32 8 16
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark import catalog  # noqa: E402
from data_engineering_zoomcamp_projects_spark.registry import all_queries  # noqa: E402
from data_engineering_zoomcamp_projects_spark.session import get_spark  # noqa: E402

_ORIG = catalog.widen_if_narrow


def _patched(target: int):
    def widen(spark, df, min_bytes: int = 2 * 1024 * 1024, **kw):
        if target == 0:
            return _ORIG(spark, df, min_bytes, **kw)
        if target < 0:  # -1 = never widen (identity)
            return df
        return df.repartition(target)

    return widen


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    widths = [int(a) for a in sys.argv[1:]] or [0, 8, 16]
    rounds = int(os.environ.get("SPARK_GRAFT_PROBE_ROUNDS", "4"))
    spark = get_spark(app_name="probe_decode_width")
    q = all_queries()["multimodal_image_decode_resize"]
    # warmup (stock width)
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    results: dict[int, list[float]] = {w: [] for w in widths}
    for _ in range(rounds):
        for w in widths:
            catalog.widen_if_narrow = _patched(w)
            try:
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                results[w].append(time.perf_counter() - t0)
            finally:
                catalog.widen_if_narrow = _ORIG
    for w in widths:
        ts = results[w]
        label = "stock" if w <= 0 else f"{w:>5}"
        print(f"width {label}: " + " ".join(f"{t:6.2f}" for t in ts))


if __name__ == "__main__":
    main()
