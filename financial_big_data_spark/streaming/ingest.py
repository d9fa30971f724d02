"""Streaming corpus ingest with UNBOUNDED-horizon dedup: corpus-as-state.

``streaming_exact_dedup`` (dedup.py) is watermark-bounded by design — the
engine must evict fingerprint state, so a duplicate re-arriving AFTER the
horizon passes. For corpus building that is the wrong trade: a document
crawled twice a week apart is still a duplicate. The fix is the same
pattern as the upsert sink (upsert.py): move the state INTO the table.

Per micro-batch (``foreachBatch``):

1. quality gate (optional) — the shared map-only Column predicates;
2. within-batch collapse — min-id per normalized-content fingerprint;
3. corpus anti-join — ``incremental_dedup`` (operators/dedup.py): the
   accumulated corpus is read as DISTINCT FINGERPRINTS ONLY (column
   pruning reaches the parquet scan; md5 keys shuffle uniformly);
4. append survivors to the corpus directory.

Replay safety: ``foreachBatch`` is at-least-once, and a plain append sink
would duplicate on replay — but step 3 makes the composition CONVERGENT:
a replayed batch's fingerprints are already in the corpus, so the
anti-join drops every row and the replay appends nothing (pinned by the
fresh-checkpoint replay test). A crashed mid-batch write never commits
partial files (Spark's output committer), so the invariant holds across
failures too.

State cost at 100 TB: zero state store; each batch reads the corpus's
fingerprint COLUMN (a fraction of corpus bytes; at larger scale the
fingerprints live in their own compacted side table via
sources/maintenance.py and the scan is constant-ish per batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text


def _collapse_per_fingerprint(fp: DataFrame, id_col: str) -> DataFrame:
    """ONE deterministic representative row per fingerprint: min over
    (id, rest-of-row) — exact duplicate rows sharing both id and
    fingerprint keep a single copy (a left_semi on (min-id, fp) alone
    would keep every such copy). Shared by both ingest front doors."""
    return (
        fp.groupBy("_fp")
        .agg(F.min(F.struct(F.col(id_col), *[
            F.col(c) for c in fp.columns if c not in (id_col, "_fp")
        ])).alias("_row"))
        .select(F.col("_fp"), F.col("_row.*"))
    )


def streaming_ingest_dedup(
    stream: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    quality_gate: bool = False,
    available_now: bool = True,
):
    """Start the ingest query; returns the StreamingQuery.

    With ``quality_gate`` the shared Gopher-style pass_quality predicate
    (operators/quality.py) filters each batch before dedup.
    """

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        if quality_gate:
            from ..operators.quality import quality_metric_columns

            cols = quality_metric_columns(text)
            batch = batch.where(cols["pass_quality"] == 1)
        fp = batch.withColumn("_fp", F.md5(normalized_text(text)))
        collapsed = _collapse_per_fingerprint(fp, id_col)
        if os.path.exists(corpus_path):
            seen = (
                batch.sparkSession.read.parquet(corpus_path)
                .select(F.md5(normalized_text(text)).alias("_fp"))
                .distinct()
            )
            fresh = collapsed.join(seen, on="_fp", how="left_anti")
        else:
            fresh = collapsed
        fresh.drop("_fp").write.mode("append").parquet(corpus_path)

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _committed_files(table_path: str) -> list[str] | None:
    """The curated table's COMMITTED file list (manifest-defined), or
    None when the table has no committed snapshot yet. Completes any
    torn commit first (single-writer recovery — see
    ``sources.versioned.repair_current``)."""
    from ..sources.versioned import _load_manifest, current_version, repair_current

    repair_current(table_path)
    try:
        current_version(table_path)
    except FileNotFoundError:
        return None
    return _load_manifest(table_path, None)["files"]


def _read_committed(spark, table_path: str, status: str | None = None):
    """Manifest-scoped read of the curated table: only committed files
    reach the scan (a half-written batch is structurally invisible).
    ``_status`` is recovered from each file's partition directory name
    DRIVER-side and injected as a literal — the file lists are the
    pruning, so asking for one status never even lists the other
    partition's files (stronger than planner pruning; basePath-style
    discovery can't cross the per-batch staging directories anyway)."""
    files = _committed_files(table_path)
    if files is None:
        return None

    def _status_of(f: str) -> str | None:
        for part in f.split(os.sep):
            if part.startswith("_status="):
                return part.split("=", 1)[1]
        return None

    groups: dict[str, list[str]] = {}
    for f in files:
        s = _status_of(f)
        if s is not None:
            groups.setdefault(s, []).append(f)
    wanted = [status] if status is not None else sorted(groups)
    # recorded-schema scans (sources/versioned._scan_files): the state
    # read runs EVERY micro-batch — a schema-inference job per status
    # group per batch is pure job-floor waste
    from ..sources.versioned import _scan_files

    frames = [
        _scan_files(spark, table_path, groups[s]).withColumn("_status", F.lit(s))
        for s in wanted
        if groups.get(s)
    ]
    if not frames:
        # a committed snapshot EXISTS but holds no files of the requested
        # status (e.g. every document so far was rejected as a near-dup):
        # that is an empty result, not a missing table — return an empty
        # frame in the table's schema (one footer read, filter-to-false)
        # so pollers see zero rows instead of a crash
        if not files:
            return None  # committed-but-zero-files: no schema to offer
        empty = spark.read.parquet(files[0]).limit(0)
        return empty.withColumn(
            "_status", F.lit(status if status is not None else "")
        )
    out = frames[0]
    for d in frames[1:]:
        out = out.unionByName(d)
    return out


def read_curated_corpus(spark, table_path: str) -> DataFrame:
    """The accepted corpus out of a ``streaming_ingest_curated`` table:
    a manifest-scoped, partition-pruned scan (``_status=accepted`` is a
    partition directory — rejected rows' files are never listed, let
    alone opened), original columns only."""
    df = _read_committed(spark, table_path, status="accepted")
    if df is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    drop = [c for c in ("_status", "_fp", "_mh", "_shingles") if c in df.columns]
    return df.drop(*drop)


def streaming_ingest_curated(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    quality_gate: bool = False,
    near_dup_jaccard: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    available_now: bool = True,
):
    """Streaming front door with the FULL batch curation semantics:
    quality gate → exact dedup → MinHash/LSH NEAR-dup gate, per
    micro-batch, against everything already ingested. The batch
    pipeline's ``curate_corpus`` runs the same stages offline; this
    makes near-dups drop AT INGEST instead of waiting for the periodic
    batch pass.

    The table at ``table_path`` is both sink and state — one ATOMIC
    MANIFEST COMMIT per batch (sources/versioned.py's O_EXCL protocol:
    staging files + hard-linked manifest + CURRENT flip, so readers see
    whole batches or nothing), partitioned by ``_status``:

    - ``accepted`` rows are the corpus (``read_curated_corpus`` is a
      partition-pruned scan that never opens rejected files);
    - ``near_dup`` rows are REJECTED documents retained as dedup
      knowledge + audit trail. Retaining them mirrors
      ``curate_corpus`` exactly: its ``near_dup_lsh`` pass drops the
      higher id of every verified pair even when the lower id was
      itself dropped, so victims must keep vetoing later arrivals.

    Each ingested row carries its MinHash signature (``_mh``), shingle
    set (``_shingles``) and fingerprint (``_fp``), so the per-batch
    near-dup check is: band the BATCH signatures (small), hash-join
    them against the table's banded signatures (one scan of three
    columns, no shuffle of the corpus), then verify candidates with
    exact Jaccard over the stored shingle sets — never all-pairs,
    identical band/verify math to ``near_dup_lsh``.

    Parity with ``curate_corpus`` (pinned by test): feeding the same
    documents in id order through any batch split yields EXACTLY the
    batch pipeline's accepted set, because all three gates use the
    same predicates and the same drop-the-higher-id rule. Streaming
    keeps the FIRST-arrived representative of each fingerprint —
    equal to batch's min-id winner when arrival order follows ids;
    out-of-order arrival degrades representative choice, never
    membership of the dedup state.

    Replay safety: a replayed batch's fingerprints are already in the
    committed table (accepted OR rejected rows), so the exact-dedup
    anti-join empties it and nothing commits — convergent under
    foreachBatch's at-least-once contract. Unlike a plain parquet
    append, the manifest commit makes the batch boundary STRUCTURAL: a
    crash mid-write leaves only unreferenced staging files, and a crash
    between manifest publish and CURRENT flip is completed by
    ``repair_current`` at the next state read (single-writer contract).
    """
    # the digest / min-slice / banding math comes from dedup.py's shared
    # primitives — the batch-parity claim is load-bearing, so there is
    # exactly ONE definition of each for batch and streaming to share
    from ..operators.dedup import (
        band_structs,
        minhash_digest,
        minhash_min_slices,
        shingle_table,
    )

    def _sigs_and_shingles(df: DataFrame) -> DataFrame:
        """(id, _mh array<string>, _shingles array<string>); docs with
        fewer than shingle_n tokens get an empty array and a null
        signature — they can never be near-dup candidates, matching
        near_dup_lsh dropping them at the signature stage."""
        sh = shingle_table(df, text, id_col, shingle_n, distinct=False)
        agg = (
            sh.select(
                F.col(id_col), F.col("shingle"),
                minhash_digest(num_hashes).alias("h"),
            )
            .groupBy(id_col)
            .agg(
                F.array(*minhash_min_slices(num_hashes)).alias("_mh"),
                F.collect_set("shingle").alias("_shingles"),
            )
        )
        return df.join(agg, on=id_col, how="left").withColumn(
            "_shingles", F.coalesce(F.col("_shingles"), F.array().cast("array<string>"))
        )

    def _banded(df: DataFrame, idc: str) -> DataFrame:
        band_cols = band_structs(num_hashes, bands, lambda i: F.col("_mh")[i])
        return (
            df.where(F.col("_mh").isNotNull())
            .select(F.col(idc), F.explode(F.array(*band_cols)).alias("bk"))
            .select(idc, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        )

    jac = lambda a, b: (  # noqa: E731 - exact Jaccard over stored sets
        F.size(F.array_intersect(a, b)).cast("double")
        / (F.size(a) + F.size(b) - F.size(F.array_intersect(a, b)))
    )

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if quality_gate:
            from ..operators.quality import quality_metric_columns

            cols = quality_metric_columns(text)
            batch = batch.where(cols["pass_quality"] == 1)
        fp = batch.withColumn("_fp", F.md5(normalized_text(text)))
        collapsed = _collapse_per_fingerprint(fp, id_col)
        state = _read_committed(spark, table_path)
        if state is not None:
            fresh = collapsed.join(
                state.select("_fp").distinct(), on="_fp", how="left_anti"
            )
        else:
            fresh = collapsed
        fresh = _sigs_and_shingles(fresh).cache()
        try:
            if fresh.isEmpty():
                # nothing new (all quality-rejected or already seen) — a
                # schema-less empty append would poison the next batch's
                # state read when the table doesn't exist yet
                return
            fb = _banded(fresh, id_col)
            # vs accumulated table: every stored doc is "earlier", so any
            # verified match drops the fresh doc (drop-the-later rule)
            drops = None
            if state is not None:
                sb = _banded(
                    state.select(F.col(id_col).alias("_sid"), "_mh"), "_sid"
                )
                cand_s = (
                    sb.join(F.broadcast(fb), on=["band", "key"])
                    .select(id_col, "_sid")
                    .distinct()
                )
                ver_s = (
                    cand_s.join(
                        state.select(
                            F.col(id_col).alias("_sid"),
                            F.col("_shingles").alias("_sh_s"),
                        ),
                        on="_sid",
                    )
                    .join(fresh.select(id_col, F.col("_shingles").alias("_sh_f")), on=id_col)
                    .where(jac(F.col("_sh_f"), F.col("_sh_s")) >= near_dup_jaccard)
                    .select(id_col)
                    .distinct()
                )
                drops = ver_s
            # within-batch: id_a < id_b band candidates, drop id_b of every
            # verified pair (curate_corpus's exact rule — victims still veto)
            a, b = fb.alias("a"), fb.alias("b")
            cand_b = (
                a.join(b, on=["band", "key"])
                .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                .select(
                    F.col(f"a.{id_col}").alias("_ida"),
                    F.col(f"b.{id_col}").alias("_idb"),
                )
                .distinct()
            )
            ver_b = (
                cand_b.join(
                    fresh.select(F.col(id_col).alias("_ida"), F.col("_shingles").alias("_sh_a")),
                    on="_ida",
                )
                .join(
                    fresh.select(F.col(id_col).alias("_idb"), F.col("_shingles").alias("_sh_b")),
                    on="_idb",
                )
                .where(jac(F.col("_sh_a"), F.col("_sh_b")) >= near_dup_jaccard)
                .select(F.col("_idb").alias(id_col))
                .distinct()
            )
            drops = ver_b if drops is None else drops.unionByName(ver_b).distinct()
            out = fresh.join(drops, on=id_col, how="left_anti").withColumn(
                "_status", F.lit("accepted")
            ).unionByName(
                fresh.join(drops, on=id_col, how="left_semi").withColumn(
                    "_status", F.lit("near_dup")
                )
            )
            # ONE ATOMIC COMMIT per micro-batch (VERDICT r6 #3): the
            # batch's files land in a fresh staging directory, then the
            # new manifest (= previous files + batch files) publishes via
            # the O_EXCL hard-link + CURRENT flip from
            # sources/versioned.py. Readers see the previous snapshot or
            # the whole batch, never a torn middle — the replay-
            # convergence argument is now structural, not an assumption
            # about parquet append visibility:
            # - crash during the file write: nothing referenced by any
            #   manifest, invisible; replay re-evaluates the whole batch
            #   (orphaned staging files are dead weight, not state);
            # - crash between manifest publish and CURRENT flip:
            #   ``repair_current`` (run at every state read, single-writer
            #   contract) completes the commit; the replayed batch then
            #   anti-joins itself away and appends nothing.
            import glob as _glob
            import uuid as _uuid

            from ..sources.versioned import _commit, current_version

            staging = os.path.join(
                table_path, "data", f"batch-{_uuid.uuid4().hex[:12]}"
            )
            out.write.partitionBy("_status").parquet(staging)
            new_files = sorted(
                _glob.glob(os.path.join(staging, "_status=*", "*.parquet"))
            )
            if new_files:
                prev = _committed_files(table_path) or []
                try:
                    v = current_version(table_path) + 1
                except FileNotFoundError:
                    v = 1
                _commit(table_path, prev + new_files, v)
                # record the FILE schema (sans the _status partition dir)
                # so every later state read scans schema-free
                from ..sources.versioned import _save_schema

                _save_schema(out.drop("_status"), table_path)
        finally:
            fresh.unpersist()

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
