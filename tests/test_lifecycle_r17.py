"""r17 ADVICE fixes, pinned as tested behavior.

Four holes in the r16 generation protocol, all filed by the r16
advisor against `llm/similarity.py`:

1. (high) CAS publish could "win" at a base+1 number that a SUCCESSOR
   had used and expiry had since freed — planting a non-lineage
   generation below the live top (silent append loss / tombstone
   clears that resurrect deleted rows).
2. (medium) the compactors read their base generation UNPINNED, so a
   base superseded mid-rewrite could be expired under the in-flight
   Spark job.
3. (medium) retention aged generations by dir mtime (time WRITTEN),
   not time SUPERSEDED — a generation current for hours was
   expiry-eligible the instant two successors landed.
4. (low) pin files were keyed (pid, generation): two readers in one
   process sharing a lease file; first exit dropped the other's lease.
"""

import glob
import os
import shutil
import time

import pytest

from data_engineering_zoomcamp_projects_spark.llm import similarity as sim
from data_engineering_zoomcamp_projects_spark.llm.similarity import (
    _ann_data_dir,
    _flip_pointer_forward,
    _pinned_generations,
    _publish_generation,
    append_to_ann_index,
    build_ann_index,
    compact_ann_index,
    compact_ann_index_incremental,
    expire_ann_index_generations,
    pin_ann_index_generation,
    serve_ann_index,
)


def _corpus(spark, tmp_path, n=120):
    rows = [
        (i, [float((i * 7 + j * 3) % 10) for j in range(64)], i % 3)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))


def _novel_batch(spark, start, n=8):
    rows = [
        (start + q, [float((7 * q + 3 * j * j) % 23 + 1) for j in range(64)])
        for q in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_cas_publish_refuses_stale_base_below_live_top(tmp_path, monkeypatch):
    """ADVICE 1 (high): a CAS whose base has live successors must lose
    even when the base+1 NUMBER is free (its original occupant
    expired). Both closures fire: the pre-rename successor check, and
    the post-rename head verify (exercised by hiding the successor
    from the first listing only)."""
    local = str(tmp_path / "idx")
    os.makedirs(os.path.join(local, "data.g000001"))
    os.makedirs(os.path.join(local, "data.g000003"))  # g2 expired away
    with open(os.path.join(local, "_current"), "w") as fh:
        fh.write("data.g000003")

    # pre-rename check: base=1 while g3 exists -> None, staging intact,
    # no g2 planted, pointer still at the live top
    staged = os.path.join(local, "data__stage_test")
    os.makedirs(staged)
    with open(os.path.join(staged, "part-0.parquet"), "w") as fh:
        fh.write("x")
    assert _publish_generation(local, staged, base=1) is None
    assert os.path.isdir(staged), "lost CAS must leave staging for re-link"
    assert not os.path.isdir(os.path.join(local, "data.g000002"))
    assert _ann_data_dir(local).endswith("data.g000003")

    # post-rename verify: make the publisher's FIRST listing stale
    # (the advisor's stall window) — rename succeeds at g2, the head
    # re-verify sees g3, rolls the plant back, reports the lost race
    real = sim._ann_gen_dirs
    calls = {"n": 0}

    def stale_once(p):
        calls["n"] += 1
        gens = real(p)
        if calls["n"] == 1:  # the pre-rename snapshot: hide g3
            return [g for g in gens if g[0] <= 1]
        return gens

    monkeypatch.setattr(sim, "_ann_gen_dirs", stale_once)
    assert _publish_generation(local, staged, base=1) is None
    monkeypatch.setattr(sim, "_ann_gen_dirs", real)
    assert not os.path.isdir(
        os.path.join(local, "data.g000002")
    ), "stale commit below the live top must be rolled back"
    assert _ann_data_dir(local).endswith("data.g000003")


@pytest.mark.parametrize("compactor", ["full", "incremental"])
def test_compactors_lease_base_against_mid_pass_expiry(
    spark, tmp_path, compactor
):
    """ADVICE 2 (medium): the compactors pin their base generation for
    the whole rewrite. Injected at _copy_fp_stamp (inside the leased
    region, after the Spark read): a successor is published and the
    pointer flipped — the base is now superseded — then a force-expiry
    (keep_last=1, max_age_secs=0, far harsher than production) runs.
    Without the lease the base dir is removed mid-pass; with it the
    base survives, the pass loses its CAS cleanly, and the retry from
    the new current generation preserves every row."""
    _corpus(spark, tmp_path, n=120)
    path = build_ann_index(spark, str(tmp_path))
    try:
        append_to_ann_index(spark, path, _novel_batch(spark, 5_000))
        base_dir = _ann_data_dir(path)
        base_n = int(os.path.basename(base_dir)[len("data.g"):])
        before = sorted(
            r["vec_id"]
            for r in spark.read.parquet(base_dir).select("vec_id").collect()
        )

        real_stamp = sim._copy_fp_stamp
        fired = {"n": 0}

        def supersede_then_expire(src, dst):
            real_stamp(src, dst)
            if fired["n"]:
                return
            fired["n"] = 1
            succ = os.path.join(
                os.path.dirname(base_dir), f"data.g{base_n + 1:06d}"
            )
            shutil.copytree(base_dir, succ)
            real_stamp(base_dir, succ)
            _flip_pointer_forward(os.path.dirname(base_dir))
            expired = expire_ann_index_generations(
                path, keep_last=1, max_age_secs=0
            )
            assert base_n not in expired, "leased base expired mid-pass"
            assert os.path.isdir(base_dir), "base yanked from in-flight job"

        sim._copy_fp_stamp = supersede_then_expire
        try:
            if compactor == "full":
                compact_ann_index(spark, path)
            else:
                compact_ann_index_incremental(spark, path, min_files=2)
        finally:
            sim._copy_fp_stamp = real_stamp
        assert fired["n"] == 1, "injection never ran; test is vacuous"
        after = sorted(
            r["vec_id"]
            for r in spark.read.parquet(_ann_data_dir(path))
            .select("vec_id")
            .collect()
        )
        assert after == before, "rows lost across the contended rewrite"
        assert not glob.glob(
            os.path.join(os.path.dirname(base_dir), "_pin.*")
        ), "compactor leaked its lease file"
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_retention_ages_from_supersession_not_write_time(spark, tmp_path):
    """ADVICE 3 (medium): ANN_GEN_RETENTION_SECS promises survival
    AFTER supersession. The pointer flip stamps every generation it
    moves past, so a generation that was current for hours (backdated
    mtime here) is NOT expiry-eligible the moment successors land —
    only once the retention window has elapsed since the flip."""
    _corpus(spark, tmp_path, n=120)
    path = build_ann_index(spark, str(tmp_path))
    try:
        g1 = _ann_data_dir(path)
        old = time.time() - 100_000
        os.utime(g1, (old, old))  # "current for hours"
        append_to_ann_index(spark, path, _novel_batch(spark, 5_000))
        assert _ann_data_dir(path) != g1
        assert time.time() - os.path.getmtime(g1) < 300, (
            "flip did not stamp the superseded generation"
        )
        expired = expire_ann_index_generations(
            path, keep_last=1, max_age_secs=3600
        )
        assert os.path.isdir(g1), (
            "freshly superseded generation expired on write-time age"
        )
        g1_n = int(os.path.basename(g1)[len("data.g"):])
        assert g1_n not in expired
        # once the SUPERSESSION is old, the same call removes it
        os.utime(g1, (old, old))
        expired2 = expire_ann_index_generations(
            path, keep_last=1, max_age_secs=3600
        )
        assert g1_n in expired2
        assert not os.path.isdir(g1)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_pin_files_are_per_lease_not_per_pid(spark, tmp_path):
    """ADVICE 4 (low): two leases in ONE process on the SAME
    generation hold independent pin files — the first to exit no
    longer deletes the lease out from under the other. Legacy
    nonce-less pin files still parse (and dead-pid ones are swept)."""
    _corpus(spark, tmp_path, n=120)
    path = build_ann_index(spark, str(tmp_path))
    try:
        g1 = _ann_data_dir(path)
        g1_name = os.path.basename(g1)
        g1_n = int(g1_name[len("data.g"):])
        with pin_ann_index_generation(path, g1_n) as d1:
            append_to_ann_index(spark, path, _novel_batch(spark, 5_000))
            with pin_ann_index_generation(path, g1_n) as d2:
                assert d1 == d2 == g1
                pins = glob.glob(os.path.join(path, "_pin.*"))
                assert len(pins) == 2, "leases must not share a pin file"
            # inner lease released; the OUTER one still protects g1
            expired = expire_ann_index_generations(
                path, keep_last=1, max_age_secs=0
            )
            assert g1_n not in expired
            assert os.path.isdir(g1)
        expired2 = expire_ann_index_generations(
            path, keep_last=1, max_age_secs=0
        )
        assert g1_n in expired2

        # legacy r16 pin file (no nonce): still honored for a live pid
        cur = _ann_data_dir(path)
        legacy = os.path.join(
            path, f"_pin.{os.getpid()}.{os.path.basename(cur)}"
        )
        with open(legacy, "w"):
            pass
        assert os.path.basename(cur) in _pinned_generations(path)
        os.remove(legacy)
        # dead-pid nonce pin: swept, not honored
        stale = os.path.join(
            path, f"_pin.999999999.deadbeef.{os.path.basename(cur)}"
        )
        with open(stale, "w"):
            pass
        assert os.path.basename(cur) not in _pinned_generations(path)
        assert not os.path.exists(stale)
    finally:
        shutil.rmtree(path, ignore_errors=True)
