"""The Sparkify data-lake pipeline — the reference's entire capability
(/root/reference/etl.py) rebuilt as a library of pure DataFrame transforms.

Differences from the reference, all documented in SURVEY.md:
- users: ONE window pass instead of groupBy+self-join (etl.py:134-147);
  ``fidelity=True`` reproduces the reference's duplicate rows on
  ``(userId, ts)`` ties, default adds a deterministic tie-break.
- timestamps converted once at the edge (``timestamp_millis``), not with
  the ``timestamp 'epoch' + interval`` idiom per query (etl.py:166,202-206).
- no double computation: the reference re-reads staging and recomputes
  every table for its ``show(10)`` (etl.py:110-111 etc.); here each table
  is built once and the caller decides about actions.
- S3 push is native ``df.write`` to ``s3a://`` — never an ``aws s3 cp``
  subprocess (etl.py:239-251).

Scale notes: songs/artists dedup and the users window shuffle on their
keys; songplays' LEFT JOIN broadcasts the song catalog (dimension-sized);
partitioned writes use dynamic overwrite so reruns only touch changed
partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark import schemas
from data_engineering_nd_datalake_project_4_spark.functions import weekday_monday
from data_engineering_nd_datalake_project_4_spark.operators.dedup import latest_per_key
from data_engineering_nd_datalake_project_4_spark.sources import read_json
from data_engineering_nd_datalake_project_4_spark.sources.sinks import write_parquet


@dataclass(frozen=True)
class SparkifyConfig:
    """Replaces the reference's INI parsing (/root/reference/etl.py:50-59)."""

    log_data_path: str
    song_data_path: str
    output_root: str
    declared_schemas: bool = False  # True = reference's FLOAT schemas
    #: malformed-record posture for the raw JSON feeds. The reference has
    #: none (/root/reference/etl.py:83-95 — a torn S3 line silently became
    #: an all-NULL row); PERMISSIVE default keeps that fidelity, real
    #: deployments should run DROPMALFORMED or set bad_records_path.
    ingest_mode: str = "PERMISSIVE"
    bad_records_path: str | None = None


def ingest_logs(spark: SparkSession, cfg: SparkifyConfig) -> DataFrame:
    """R01: recursive JSON-lines scan of the event log
    (/root/reference/etl.py:83-85)."""
    ddl = schemas.LOG_EVENTS_DECLARED_DDL if cfg.declared_schemas else schemas.LOG_EVENTS_DDL
    return read_json(
        spark, cfg.log_data_path, ddl, recursive=True,
        mode=cfg.ingest_mode, bad_records_path=cfg.bad_records_path,
    )


def ingest_songs(spark: SparkSession, cfg: SparkifyConfig) -> DataFrame:
    """R02: recursive one-object-per-file JSON scan of the song catalog
    (/root/reference/etl.py:93-95)."""
    ddl = schemas.SONGS_DECLARED_DDL if cfg.declared_schemas else schemas.SONGS_DDL
    return read_json(
        spark, cfg.song_data_path, ddl, recursive=True,
        mode=cfg.ingest_mode, bad_records_path=cfg.bad_records_path,
    )


def songs_table(songs: DataFrame) -> DataFrame:
    """5-col distinct projection (/root/reference/etl.py:98-111)."""
    return songs.select("song_id", "title", "artist_id", "year", "duration").distinct()


def artists_table(songs: DataFrame) -> DataFrame:
    """/root/reference/etl.py:113-122."""
    return songs.select(
        "artist_id", "artist_name", "artist_location", "artist_latitude", "artist_longitude"
    ).distinct()


def users_table(logs: DataFrame, fidelity: bool = False) -> DataFrame:
    """Latest event per user (/root/reference/etl.py:124-149).

    Reference semantics retained: logged-out events with ``userId = ''``
    (empty string, NOT null) are KEPT — the output contains an
    empty-string user (SURVEY.md §1.3).

    fidelity=False (default): one window, tie-break larger sessionId then
    itemInSession — deterministic, no duplicates.
    fidelity=True: the reference's aggregate + join-back on
    ``(userId, MAX(ts))``, which emits duplicate rows when a user has two
    events at the same ms (observed multiplicity 2 in the real data).
    """
    cols = ["userId", "firstName", "lastName", "gender", "level"]
    if fidelity:
        latest = logs.groupBy("userId").agg(F.max("ts").alias("ts"))
        return logs.join(latest, ["userId", "ts"], "inner").select(*cols)
    return latest_per_key(
        logs,
        ["userId"],
        [F.desc("ts"), F.desc("sessionId"), F.desc("itemInSession")],
    ).select(*cols)


def songplays_table(logs: DataFrame, songs: DataFrame) -> DataFrame:
    """NextSong fact table (/root/reference/etl.py:151-184): LEFT JOIN on
    title only — unmatched plays are retained with NULL song/artist ids
    (4 of 6,820 matched in the reference's own data, SURVEY.md §1.3).

    The song catalog is dimension-sized → broadcast; the event log never
    shuffles for this join.
    """
    plays = logs.filter(F.col("page") == "NextSong")
    t = F.timestamp_millis(F.col("ts"))
    return (
        plays.join(F.broadcast(songs), songs["title"] == plays["song"], "left")
        .select(
            plays["ts"].alias("ts"),
            F.year(t).alias("year"),
            F.month(t).alias("month"),
            "userId",
            "level",
            "song_id",
            "artist_id",
            "sessionId",
            "location",
            "userAgent",
        )
    )


def time_table(logs: DataFrame) -> DataFrame:
    """Distinct timestamps with calendar parts (/root/reference/etl.py:186-223):
    ISO week, weekday Monday=1 via ``((dayofweek+5)%7)+1`` (etl.py:216)."""
    t = F.timestamp_millis(F.col("ts"))
    d = F.to_date(t)
    return logs.select(
        t.alias("start_time"),
        F.hour(t).alias("hour"),
        F.dayofmonth(d).alias("day"),
        F.weekofyear(d).alias("week"),
        F.month(d).alias("month"),
        F.year(d).alias("year"),
        weekday_monday(d).alias("weekday"),
    ).distinct()


#: table name → (builder over (logs, songs), partition columns)
TABLE_SPECS = {
    "songs": (lambda logs, songs: songs_table(songs), ("year", "artist_id")),
    "artists": (lambda logs, songs: artists_table(songs), None),
    "users": (lambda logs, songs: users_table(logs), None),
    "songplays": (lambda logs, songs: songplays_table(logs, songs), ("year", "month")),
    "time": (lambda logs, songs: time_table(logs), ("year", "month")),
}


def run_pipeline(
    spark: SparkSession, cfg: SparkifyConfig, stage: bool = True,
    concurrency: int = 3,
) -> dict[str, DataFrame]:
    """Build and write all five tables; returns the built DataFrames.

    ``stage=True`` lands each JSON ingest as snappy parquet ONCE and builds
    all five tables from the staged columnar copy — the JSON is parsed one
    time instead of once per table write, and every table build gets
    column-pruned parquet reads. (The reference staged too — etl.py:86,96 —
    its waste was elsewhere: recomputing each *derived* table twice and
    never sharing scans. Each table here is written exactly once.)
    ``stage=False`` skips the staging round-trip — right when the input is
    tiny or already columnar.

    ``concurrency`` (r13, guide §2.6 "overlap independent jobs"): the two
    staging writes and the five table writes are INDEPENDENT jobs (pure
    builders, disjoint output dirs), but the driver used to submit them
    one at a time, leaving most of the cluster idle through each job's
    tail. A small thread pool lets the next job's tasks back-fill freed
    executors — Spark's scheduler runs concurrent jobs FIFO, which is
    exactly the back-fill behaviour wanted; the driver DataFrame API is
    thread-safe for this use. Table contents and layouts are unchanged
    (same builders, same writes — threads only change submission order).
    Measured warm end-to-end at the bench workload (100k events):
    ~5.0 s serial → ~3.0 s at concurrency=3. ``concurrency=1`` restores
    strictly serial submission.
    """
    logs = ingest_logs(spark, cfg)
    songs = ingest_songs(spark, cfg)
    if stage:
        stage_jobs = [
            (logs, f"{cfg.output_root}/_staging/logs"),
            (songs, f"{cfg.output_root}/_staging/songs"),
        ]
        if concurrency > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                list(pool.map(lambda j: write_parquet(j[0], j[1]), stage_jobs))
        else:
            for df, path in stage_jobs:
                write_parquet(df, path)
        logs = spark.read.parquet(f"{cfg.output_root}/_staging/logs")
        songs = spark.read.parquet(f"{cfg.output_root}/_staging/songs")

    def _build_write(item):
        name, (builder, parts) = item
        df = builder(logs, songs)
        write_parquet(df, f"{cfg.output_root}/{name}", partition_by=parts)
        return name, df

    out: dict[str, DataFrame] = {}
    if concurrency > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for name, df in pool.map(_build_write, TABLE_SPECS.items()):
                out[name] = df
    else:
        for item in TABLE_SPECS.items():
            name, df = _build_write(item)
            out[name] = df
    return out
