"""Z-order clustering: Morton key correctness vs a bit-loop reference, and
the actual data-skipping payoff — per-file min/max ranges on BOTH key
columns shrink vs a naive (arrival-order) layout."""

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.operators.zorder import morton_key, write_zordered


def _morton_ref(x: int, y: int) -> int:
    out = 0
    for i in range(31):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_bit_loop(spark):
    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67890),
             (2**31 - 1, 0), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", morton_key("x", "y").alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def _per_file_ranges(spark, path, col):
    """Sum over files of (max(col) - min(col)) — the pruning surface: a
    predicate on ``col`` scans a file iff its range overlaps."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col(col).alias("c")
    )
    rows = df.groupBy("f").agg((F.max("c") - F.min("c")).alias("r")).collect()
    return sum(r["r"] for r in rows), len(rows)


def test_zorder_layout_tightens_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.dayofmonth("ts")).cast("long").alias("day")
    )
    zdir = str(tmp_path / "zorder")
    ndir = str(tmp_path / "naive")
    write_zordered(ev, zdir, "user_id", "day", num_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(ndir)

    z_user, zn = _per_file_ranges(spark, zdir, "user_id")
    n_user, nn = _per_file_ranges(spark, ndir, "user_id")
    z_day, _ = _per_file_ranges(spark, zdir, "day")
    n_day, _ = _per_file_ranges(spark, ndir, "day")
    assert zn >= 4 and nn >= 4
    # naive round-robin files each span ~the full domain on both
    # columns; Z-ordered files cover sub-squares — strictly tighter on
    # both dimensions simultaneously
    assert z_user < n_user
    assert z_day < n_day
    # and the clustered write loses no rows
    assert spark.read.parquet(zdir).count() == ev.count()
