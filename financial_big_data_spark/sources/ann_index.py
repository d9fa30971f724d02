"""Persisted, incrementally-maintained ANN index artifact (VERDICT r11 #1).

The one operational lever `operators/pq.py` left on the table at 100 TB:
`ivf_pq_topk` retrains coarse centroids, codebooks and (optionally) the OPQ
rotation on EVERY call — measured at ~2.6× the cached-rotation query cost
(bench `ann_ivfpq_opq_sec` 45.5s trained vs 17.2s cached), and at corpus
scale retraining also re-reads and re-encodes every vector. This module
freezes the trained state as a versioned on-disk artifact and maintains it
APPEND-ONLY, so:

- **build once** — IVF centroids + per-subspace PQ codebooks + the OPQ
  rotation are trained on the initial corpus and committed immutably;
  every corpus vector's 1-byte-per-subspace codes land in a versioned
  `codes` table (`sources/versioned.py` manifests — time travel, snapshot
  isolation and vacuum come for free).
- **append O(batch)** — new embeddings encode against the FROZEN
  codebooks/centroids/rotation (broadcast joins; one pass over the batch,
  never the corpus) and extend the codes table by reference in ONE
  `append_version` snapshot commit — the exact discipline
  `streaming/upsert.py` uses for matview maintenance. A query after an
  append reads the new snapshot; nothing is re-encoded.
- **query without training** — probes rank the stored centroids, LUTs are
  built from the stored codebooks, and the ADC scan reads the stored
  8-to-16-byte codes. The optional exact refine joins the shortlist back
  to the CALLER's vector table (`corpus=`): the index never duplicates
  raw vectors — at 100 TB the codes table is the only thing this artifact
  owns at corpus cardinality, ~400× smaller than the embeddings.
- **maintain like a table** — `delete_from_ann_index` (keyed
  copy-on-write delete; takedowns never force a rebuild) and
  `compact_ann_index` (defragment append fragments + vacuum history),
  both riding the versioned table's own machinery.

Freezing codebooks trades adaptivity for incrementality exactly like
IVF/PQ deployments do in practice (FAISS `add` after `train`): appended
vectors quantize with the ORIGINAL codebooks, so heavy distribution drift
degrades recall until a rebuild — `build_ann_index` over the full corpus
is the rebuild, and the versioned commit makes it atomic.

Determinism contract: given pinned (supplied) codebooks, encode and query
are bit-deterministic under any layout — pq_encode ties break on the
smaller code, ADC folds run in subspace order — which is what lets the
`emb_index_incremental` registry entry hash-check build→append→query
end-to-end against a from-scratch DuckDB re-derivation (the `emb_pq_adc`
discipline, queries.py).

Reference parity note: the reference repo has no comparable artifact (its
similarity scans are in-memory pandas/numpy, e.g. the pairwise matrices
in /root/reference/src/clustering/methods/clustering.py); this is
beyond-reference surface for the 100 TB embedding-corpus north star.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.pq import (
    _normalized,
    _sqdist,
    adc_luts,
    adc_score,
    opq_train,
    pq_train,
    pq_encode,
    rotate_vectors,
)
from ..operators.similarity import _as_double, cosine, dot
from .versioned import append_version, read_version, write_version

_LAYOUT_VERSION = 1


def _meta_path(path: str) -> str:
    return os.path.join(path, "ann_meta.json")


def _load_meta(path: str) -> dict:
    try:
        with open(_meta_path(path)) as fh:
            meta = json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no ANN index at {path} (missing ann_meta.json) — build one "
            "with build_ann_index"
        ) from None
    if meta.get("layout") != _LAYOUT_VERSION:
        raise ValueError(
            f"ANN index at {path} has layout {meta.get('layout')}, this "
            f"code reads layout {_LAYOUT_VERSION} — rebuild with "
            "build_ann_index"
        )
    return meta


def _prep(df: DataFrame, meta: dict, id_col: str) -> DataFrame:
    """(id, _v): the vectors in INDEX SPACE — normalized per the index's
    law (or raw when the index was built normalize=False). One map-only
    pass; the same function serves build, append and the query side so
    the three can never drift."""
    vec_col = meta["vec_col"]
    if meta["normalize"]:
        return _normalized(df, id_col, vec_col).select(
            id_col, F.col("_nv").alias("_v")
        )
    return df.select(id_col, _as_double(F.col(vec_col)).alias("_v"))


def _assign_cells(prepped: DataFrame, centers: DataFrame, id_col: str) -> DataFrame:
    """(id, _v, _cell): nearest stored centroid per vector — broadcast
    join + min_by, ties on the smaller cell (deterministic under any
    layout; matches KMeans.transform's lowest-index tie law)."""
    scored = prepped.join(F.broadcast(centers)).select(
        id_col, "_v", "_cell", _sqdist(F.col("_v"), F.col("_ctr")).alias("_d")
    )
    return scored.groupBy(id_col).agg(
        F.first("_v").alias("_v"),
        F.min_by("_cell", F.struct(F.col("_d"), F.col("_cell"))).alias("_cell"),
    )


def _encode_batch(
    spark: SparkSession, prepped: DataFrame, meta: dict, path: str, id_col: str
) -> DataFrame:
    """(id, _cell, codes) for a batch, against the index's FROZEN state:
    assign → (residual-subtract) → (rotate) → pq_encode. Reads only
    bounded artifacts (centroids/codebooks broadcast, rotation from
    meta) plus the batch itself — O(batch) by construction.

    ``to_enc`` is tracked_persist-ed (code-review r12): pq_encode's
    input and the (id, _cell) join-back are two consumers of the same
    assign/residual/rotate pipeline inside the caller's one write
    action — without the pin the batch prep would run 2-3× per encode
    (released by ``cache.release_tracked``, the registry/bench
    contract)."""
    from ..cache import tracked_persist

    if meta["n_cells"]:
        centers = read_version(spark, os.path.join(path, "centroids"))
        assigned = _assign_cells(prepped, centers, id_col)
        if meta["residual"]:
            to_enc = assigned.join(F.broadcast(centers), "_cell").select(
                id_col,
                "_cell",
                F.zip_with("_v", "_ctr", lambda x, y: x - y).alias("_v"),
            )
        else:
            to_enc = assigned
    else:
        to_enc = prepped.withColumn("_cell", F.lit(0))
    # pin BEFORE the rotation fork: keep/rot below are two readers of the
    # assign/residual pipeline, and the rotated frame is itself read
    # twice (pq_encode + the _cell join-back)
    to_enc = tracked_persist(to_enc)
    if meta["rotation"] is not None:
        keep = to_enc.select(id_col, "_cell")
        rot = rotate_vectors(
            to_enc.select(id_col, "_v"), meta["rotation"], vec_col="_v"
        )
        to_enc = tracked_persist(rot.join(keep, id_col))
    books = read_version(spark, os.path.join(path, "codebooks"))
    codes = pq_encode(to_enc, books, id_col=id_col, vec_col="_v")
    return to_enc.select(id_col, "_cell").join(codes, id_col).select(
        id_col, "_cell", "codes"
    )


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    m: int = 8,
    nbits: int = 8,
    n_cells: int | None = 16,
    seed: int = 42,
    residual: bool = False,
    opq: bool = False,
    rotation: list | None = None,
    codebooks: DataFrame | None = None,
    normalize: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_files: int | None = None,
) -> dict:
    """Train (or adopt) the quantization state and commit the index.

    Trained path (default): seeded coarse KMeans for the IVF centroids
    (when ``n_cells``), optional OPQ rotation (``opq=True`` — learned via
    ``opq_train``; or pass a precomputed ``rotation``), distributed
    per-subspace PQ codebooks (``pq_train``), then one encode pass over
    the corpus. Pinned path: pass ``codebooks`` (and optionally
    ``rotation``) explicitly — nothing is trained, encode is
    bit-deterministic (the registry/oracle route).

    Returns the meta dict. Layout under ``path``::

        ann_meta.json      params + rotation (bounded: d² floats)
        centroids/         versioned (_cell, _ctr)        [n_cells only]
        codebooks/         versioned (subspace, code, ctr)
        codes/             versioned (id, _cell, codes)   append-only
    """
    if os.path.exists(_meta_path(path)):
        raise FileExistsError(
            f"ANN index already exists at {path} — build_ann_index is the "
            "atomic REBUILD path; write to a fresh directory and swap, or "
            "append with append_ann_index"
        )
    dim = corpus.select(
        F.size(_as_double(F.col(vec_col))).alias("d")
    ).first()["d"]
    meta = {
        "layout": _LAYOUT_VERSION,
        "m": m,
        "nbits": nbits,
        "n_cells": int(n_cells) if n_cells else 0,
        "residual": bool(residual and n_cells),
        "normalize": bool(normalize),
        "rotation": rotation,
        "id_col": id_col,
        "vec_col": vec_col,
        "dim": int(dim),
        "seed": seed,
    }
    os.makedirs(path, exist_ok=True)
    prepped = _prep(corpus, meta, id_col).persist()
    try:
        if n_cells:
            # seeded distributed KMeans for the coarse quantizer; the
            # ASSIGNMENT below re-derives cells from the committed
            # centroids via _assign_cells so build and append share one
            # assignment law
            from ..operators.pq import _coarse_cells

            _assigned, centers = _coarse_cells(
                prepped.select(id_col, F.col("_v").alias("_nv")),
                n_cells, seed, id_col,
            )
            write_version(centers, os.path.join(path, "centroids"), key="_cell")
        if codebooks is None:
            # train on exactly what will be encoded (residual/rotated)
            to_train = prepped
            if n_cells:
                centers_t = read_version(spark, os.path.join(path, "centroids"))
                a = _assign_cells(prepped, centers_t, id_col)
                if meta["residual"]:
                    to_train = a.join(F.broadcast(centers_t), "_cell").select(
                        id_col,
                        F.zip_with("_v", "_ctr", lambda x, y: x - y).alias("_v"),
                    )
            if opq and rotation is None:
                meta["rotation"], _hist = opq_train(
                    to_train, vec_col="_v", id_col=id_col, m=m, nbits=nbits
                )
            if meta["rotation"] is not None:
                to_train = rotate_vectors(
                    to_train.select(id_col, "_v"), meta["rotation"], vec_col="_v"
                )
            codebooks = pq_train(
                to_train, vec_col="_v", m=m, nbits=nbits, seed=seed
            )
        write_version(codebooks, os.path.join(path, "codebooks"), key="subspace")
        codes = _encode_batch(spark, prepped, meta, path, id_col)
        write_version(
            codes, os.path.join(path, "codes"), key=id_col, n_files=n_files
        )
        # meta publishes LAST (code-review r12): its presence is the
        # "index exists and is complete" marker — the FileExistsError
        # guard above keys on it, so a crash anywhere mid-build (the
        # corpus encode is the long step) leaves a path that a re-run of
        # build_ann_index simply rebuilds (write_version commits fresh
        # replacement snapshots over any partial tables) instead of a
        # wedged meta-but-no-codes state that can neither be queried nor
        # rebuilt. _encode_batch reads the frozen state from the meta
        # DICT, not from disk, so the ordering is free.
        with open(_meta_path(path) + ".tmp", "w") as fh:
            json.dump(meta, fh)
        os.replace(_meta_path(path) + ".tmp", _meta_path(path))
    finally:
        prepped.unpersist()
    return meta


def append_ann_index(
    spark: SparkSession, batch: DataFrame, path: str, n_files: int = 1
) -> dict:
    """Encode ``batch`` against the FROZEN index state and extend the
    codes table in ONE append-only snapshot commit — O(batch) cost: the
    corpus codes are carried by manifest reference, never read, never
    rewritten. The caller owns id uniqueness across appends (same
    contract as ``append_version``). Returns {"version": v, "path": path}."""
    meta = _load_meta(path)
    prepped = _prep(batch, meta, meta["id_col"])
    codes = _encode_batch(spark, prepped, meta, path, meta["id_col"])
    v = append_version(
        spark, os.path.join(path, "codes"), codes, key=meta["id_col"],
        n_files=n_files,
    )
    return {"version": v, "path": path}


def delete_from_ann_index(
    spark: SparkSession, ids: DataFrame | list, path: str
) -> dict:
    """Remove vectors from the index by id — one keyed-DELETE snapshot
    on the codes table (footer-pruned copy-on-write: only files whose
    key range overlaps the delete set rewrite; the rest carry by
    reference). The operational requirement a 100 TB corpus index can't
    skip: takedowns / right-to-be-forgotten must not force a rebuild.

    Codebooks/centroids are unaffected — they are trained STATISTICS,
    not per-row state, so removing rows never invalidates them (the same
    frozen-state argument as append; heavy removal drift is a rebuild,
    like heavy append drift). Time travel still reads pre-delete
    snapshots until ``compact_ann_index``'s vacuum retires them — pass
    ``keep_last=1`` there if deleted vectors must also leave history.
    Returns {"version": v, "path": path} (version unchanged on an empty
    delete set — a no-op, not an error)."""
    from .versioned import current_version, delete_version

    meta = _load_meta(path)
    codes = os.path.join(path, "codes")
    if isinstance(ids, list):
        if not ids:
            # an empty purge batch is routine in a takedown pipeline;
            # createDataFrame([]) cannot infer a schema, so no-op early
            return {"version": current_version(codes), "path": path}
        ids = spark.createDataFrame([(k,) for k in ids], [meta["id_col"]])
    v = delete_version(
        spark, codes,
        ids.select(F.col(ids.columns[0]).alias(meta["id_col"])),
        key=meta["id_col"],
    )
    return {"version": v, "path": path}


def compact_ann_index(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    keep_last: int = 2,
) -> dict:
    """Index maintenance: compact the codes table's append fragments and
    retire old snapshots.

    A stream of small appends leaves the codes manifest referencing many
    tiny files (one-per-batch); queries then pay per-file open cost.
    ``compact_version`` rewrites the CURRENT snapshot into
    ceil(bytes/target) id-clustered files as a NEW snapshot (time travel
    to pre-compaction versions keeps working until ``vacuum`` retires
    them — ``keep_last`` newest manifests survive). Centroids/codebooks
    are bounded metadata and never need compaction. Codes are unchanged
    bytes — queries before and after must return identical rows (pinned
    by tests/test_ann_index.py)."""
    from .versioned import compact_version, vacuum

    meta = _load_meta(path)
    codes = os.path.join(path, "codes")
    v = compact_version(
        spark, codes, key=meta["id_col"], target_file_bytes=target_file_bytes
    )
    stats = vacuum(codes, keep_last=keep_last)
    return {"version": v, **stats}


def query_ann_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
    corpus: DataFrame | None = None,
    query_id: str = "query_id",
    exclude_self: bool = False,
    version: int | None = None,
) -> DataFrame:
    """Top-k over the stored index — no training, no corpus re-encode.

    IVF probe (when the index has cells) → LUTs from the stored
    codebooks → ADC scan over the stored codes → exact cosine refine
    against ``corpus`` (the caller's vector table) when provided, else
    pure ADC ranks: (query_id, id, adc_ip, rank). ``version`` time-travels
    the codes table (query the index as of an earlier append)."""
    from ..cache import tracked_persist

    meta = _load_meta(path)
    id_col = meta["id_col"]
    # pinned: the probe ranking, the LUT build and the refine all read the
    # prepared queries (released by cache.release_tracked — the
    # registry/bench contract)
    q_prep = tracked_persist(_prep(queries, meta, query_id))
    packed = read_version(spark, os.path.join(path, "codes"), version)
    q_lut = q_prep.select(query_id, F.col("_v").alias("_qv2"))
    if meta["rotation"] is not None:
        q_lut = rotate_vectors(q_lut, meta["rotation"], vec_col="_qv2")
    books = read_version(spark, os.path.join(path, "codebooks"))
    luts = adc_luts(
        q_lut, books, query_id=query_id, vec_col="_qv2"
    ).select(query_id, "lut")
    if meta["n_cells"]:
        centers = read_version(spark, os.path.join(path, "centroids"))
        qw = Window.partitionBy(query_id).orderBy("_d", "_cell")
        probes = (
            q_prep.join(F.broadcast(centers))
            .select(
                query_id,
                "_cell",
                _sqdist(F.col("_v"), F.col("_ctr")).alias("_d"),
                dot(F.col("_v"), F.col("_ctr")).alias("_qc_ip"),
            )
            .withColumn("_r", F.row_number().over(qw))
            .where(F.col("_r") <= n_probe)
            .select(query_id, "_cell", "_qc_ip")
        )
        base_ip = F.col("_qc_ip") if meta["residual"] else F.lit(0.0)
        cands = packed.join(probes, "_cell").join(F.broadcast(luts), query_id)
    else:
        base_ip = F.lit(0.0)
        cands = packed.crossJoin(F.broadcast(luts))
    if exclude_self:
        cands = cands.where(F.col(id_col) != F.col(query_id))
    scored = cands.select(
        query_id,
        id_col,
        (base_ip + adc_score(F.col("codes"), F.col("lut"))).alias("adc_ip"),
    )
    rw = Window.partitionBy(query_id).orderBy(F.desc("adc_ip"), F.col(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(rw))
    if corpus is None:
        return ranked.where(F.col("rank") <= k).select(
            query_id, id_col, "adc_ip", "rank"
        )
    shortlist = ranked.where(F.col("rank") <= k * refine_factor).select(
        query_id, id_col
    )
    c_prep = _prep(corpus, meta, id_col)
    exact = (
        shortlist.join(c_prep.select(id_col, F.col("_v").alias("_cv")), id_col)
        .join(q_prep, query_id)
        .select(
            query_id,
            id_col,
            cosine(F.col("_v"), F.col("_cv")).alias("cosine_sim"),
        )
    )
    fw = Window.partitionBy(query_id).orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        exact.withColumn("rank", F.row_number().over(fw))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "cosine_sim", "rank")
    )
