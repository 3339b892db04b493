"""Golden end-to-end regression (SURVEY.md §5 strategy #3): the
flagship `entry()` result at sf0.001 is fully deterministic — pin the
exact values so any silent semantic drift in the scan/filter/aggregate
path fails loudly (the oracle gate would also catch it, but only
against DuckDB; this pins OUR history)."""

from __future__ import annotations

GOLDEN_ENTRY_SF0001 = [
    ("A", "F", 13096.0, 26731890.14, 25368762.52, 26387936.89, 25.678431, 52415.470863, 0.050235, 510),
    ("A", "O", 13173.0, 27267029.09, 25899278.96, 26902747.51, 24.668539, 51061.852228, 0.050318, 534),
    ("N", "F", 15619.0, 31788102.13, 30158055.97, 31390089.18, 26.294613, 53515.323451, 0.050825, 594),
    ("N", "O", 13130.0, 27778238.79, 26325536.76, 27397179.92, 24.867424, 52610.300739, 0.051231, 528),
    ("R", "F", 13038.0, 28543439.97, 27069022.86, 28154229.08, 24.553672, 53754.124237, 0.05145, 531),
    ("R", "O", 13188.0, 27674702.11, 26333407.78, 27397110.85, 24.977273, 52414.208542, 0.048769, 528),
]


def test_entry_golden_values(spark):
    import __spark_entry__ as e

    got = sorted(tuple(r) for r in e.entry(spark).collect())
    assert got == sorted(GOLDEN_ENTRY_SF0001)


def test_entry_schema_stable(spark):
    import __spark_entry__ as e

    assert e.entry(spark).columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    ]


def test_events_ts_normalized_to_session_timestamp(spark, sf_dir):
    """events.ts must load as session-tz TIMESTAMP whatever the parquet
    physical layout (TIMESTAMP(NANOS)-as-long in early testdata
    generations, µs TIMESTAMP_NTZ in later ones): instant functions
    (unix_micros, window()) reject NTZ, and a raw long would break every
    date/window operator. Guards the load_table normalization branch."""
    from data_engineering_zoomcamp_projects_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
