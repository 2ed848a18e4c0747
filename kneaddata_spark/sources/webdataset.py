"""WebDataset-style tar shard sink: the standard sequential-read training
format for large audio/vision/text corpora (one POSIX tar per shard;
each sample is a basename-keyed member group like `key.flac` + `key.json`).

Why it belongs in this engine: every operator upstream (QC, dedup,
mixture, curriculum) ends at "materialize training shards a data loader
can stream"; row-wise parquet is the analytics sink, but GPU loaders
want large sequential tar members. This module is that last step,
Spark-shaped:

- `shard_plan` assigns (shard, pos) by CONTIGUOUS key-order chunks of
  `samples_per_shard` (the WebDataset convention) using
  pairs.global_rank — a range sort + per-partition offsets, NO
  single-partition window (the plan-audit rule). For a seeded-random
  epoch order, feed corpus.shard_shuffle's output instead.
- `shard_manifest` is the pure-DataFrame accounting of the same plan
  (per shard: sample count, payload bytes, key range) — SQL-expressible,
  so the driver oracle checks the assignment arithmetic end to end.
- `write_shards` materializes the tars: repartition on shard (hash
  co-location puts every row of a shard in exactly one task),
  sortWithinPartitions(shard, pos), then one Arrow pass per partition
  streams members into `shard-%06d.tar` files and emits a per-shard
  receipt (count, bytes, sha256). Tar bytes are BYTE-DETERMINISTIC
  (mtime=0, uid/gid=0, fixed member order, canonical JSON), so reruns
  produce identical files — retry-idempotent and diffable by hash.

100 TB shape: one range-sort shuffle for ranks, one hash shuffle to
co-locate shards, then embarrassingly parallel sequential writes (no
driver involvement, no global window, no collect). Shard size is
bounded by samples_per_shard; a byte-capped variant belongs upstream
(length_buckets / budget_cap) where token/byte accounting already
lives. On a real cluster the open() target is a mounted object store
or task-local disk + upload; the writer only needs a file path, so the
seam is the `out_dir` string.

Reference lineage: kneaddata's final stage re-emits cleaned reads as
new FASTQ files per category (run.py output writers; sources/fastq.py
S9b is the in-repo analog) — this is the same "repo-of-record emission"
for training consumers, in the format trainers actually read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_plan(
    df: DataFrame,
    id_col: str,
    samples_per_shard: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add (shard, pos): contiguous chunks of `samples_per_shard` keys in
    `id_col` order. shard = rank div n, pos = rank mod n — the exact
    arithmetic the DuckDB oracle replays with row_number().

    Keys must be UNIQUE (they are the tar member basenames): only the id
    column goes through the rank's range sort (global_rank persists its
    ranged frame, and payloads do not belong in that cache); payload and
    meta columns join back on the id afterwards."""
    from ..operators.pairs import global_rank

    n = int(samples_per_shard)
    if n <= 0:
        raise ValueError("samples_per_shard must be positive")
    ranked = global_rank(
        df.select(id_col), [id_col], rank_col="__r", num_partitions=num_partitions
    )
    planned = ranked.select(
        id_col,
        F.expr(f"cast((__r - 1) div {n} as bigint)").alias("shard"),
        F.expr(f"cast((__r - 1) % {n} as bigint)").alias("pos"),
    )
    return df.join(planned, id_col)


def shard_manifest(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    samples_per_shard: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(shard, n_samples, payload_bytes, first_key, last_key) — the
    write-free accounting of shard_plan over the same input. payload
    bytes use octet_length (UTF-8 bytes for strings, raw length for
    binary), matching the tar member sizes write_shards emits."""
    planned = shard_plan(df, id_col, samples_per_shard, num_partitions)
    return planned.groupBy("shard").agg(
        F.count("*").alias("n_samples"),
        F.sum(F.octet_length(F.col(payload_col))).alias("payload_bytes"),
        F.min(id_col).alias("first_key"),
        F.max(id_col).alias("last_key"),
    )


_RECEIPT_SCHEMA = (
    "shard bigint, n_samples bigint, tar_bytes bigint, sha256 string, path string"
)


def _canon_json(meta: dict) -> bytes:
    import json

    # numpy scalars (pandas batch cells) are not JSON-serializable
    clean = {k: (v.item() if hasattr(v, "item") else v) for k, v in meta.items()}
    return json.dumps(clean, sort_keys=True, separators=(",", ":")).encode("utf-8")


def write_shards(
    planned: DataFrame,
    out_dir: str,
    id_col: str,
    payload_col: str,
    payload_ext: str = "txt",
    meta_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Write one `shard-%06d.tar` per shard under out_dir; returns the
    per-shard receipt frame (shard, n_samples, tar_bytes, sha256, path).

    Input must carry (shard, pos) from shard_plan / corpus.shard_shuffle.
    Member layout per sample: `{key}.{payload_ext}` (payload bytes; str
    payloads are UTF-8 encoded) then `{key}.json` (canonical JSON of
    meta_cols). Headers are normalized (mtime=0, uid/gid=0, USTAR), so
    the sha256 receipt is stable across reruns — the determinism tests
    and any downstream cache key rely on it.

    This is a fenced SINK like flacarchive.reencode_trimmed: payload
    bytes cross into Python once, are streamed to the tar, and never
    return to the JVM — only scalar receipts come back."""
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = tuple(meta_cols)
    cols = ["shard", "pos", id_col, payload_col, *meta_cols]

    def _writer(it):
        import hashlib
        import io
        import tarfile

        import pandas as pd

        state: dict = {"shard": None, "tf": None, "path": None, "n": 0}
        receipts: list[tuple] = []

        def _finish():
            state["tf"].close()
            with open(state["path"], "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()
            receipts.append(
                (
                    int(state["shard"]),
                    int(state["n"]),
                    int(os.path.getsize(state["path"])),
                    digest,
                    state["path"],
                )
            )

        def _member(tf, name: str, blob: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            info.mtime = 0
            info.mode = 0o644
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(blob))

        for pdf in it:
            for row in pdf.itertuples(index=False):
                shard = int(row.shard)
                if shard != state["shard"]:
                    if state["tf"] is not None:
                        _finish()
                    path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
                    state.update(
                        shard=shard,
                        tf=tarfile.open(path, "w", format=tarfile.USTAR_FORMAT),
                        path=path,
                        n=0,
                    )
                key = str(getattr(row, id_col))
                payload = getattr(row, payload_col)
                blob = (
                    payload.encode("utf-8") if isinstance(payload, str) else bytes(payload)
                )
                _member(state["tf"], f"{key}.{payload_ext}", blob)
                meta = {c: getattr(row, c) for c in meta_cols}
                meta[id_col] = getattr(row, id_col)
                _member(state["tf"], f"{key}.json", _canon_json(meta))
                state["n"] += 1
        if state["tf"] is not None:
            _finish()
        yield pd.DataFrame(
            receipts, columns=["shard", "n_samples", "tar_bytes", "sha256", "path"]
        )

    co_located = planned.select(*cols).repartition(F.col("shard")).sortWithinPartitions(
        "shard", "pos"
    )
    return co_located.mapInPandas(_writer, schema=_RECEIPT_SCHEMA)


_SAMPLE_SCHEMA = (
    "key string, payload binary, meta string, shard long, shard_path string"
)


def read_shards(
    spark,
    shard_dir: str,
    payload_ext: str = "txt",
) -> DataFrame:
    """WebDataset tar shard SOURCE — the read half of write_shards, so a
    corpus can round-trip engine -> training shards -> engine (resuming
    curation from the materialized artifact, auditing what a trainer
    actually consumed, or re-screening an externally produced WDS set).

    `binaryFile` hands each tar to exactly one task (the WebDataset
    loader shape: a shard IS the sequential-read unit); ONE fenced Arrow
    stage streams members out of the in-memory tar with `tarfile`,
    pairing `{key}.{payload_ext}` with `{key}.json` by basename and
    emitting (key, payload, meta, shard, shard_path) rows. Payload bytes
    cross Python->JVM here by necessity — this is a SOURCE, the symmetric
    fenced exception to bytes-never-crosses that write_shards holds on
    the sink side. No shuffle; parallelism = number of shards.

    Member-pairing contract (write_shards layout): the payload member
    precedes its json; a payload without json (or vice versa) raises —
    a torn shard should fail loudly, not half-load."""
    import re

    files = spark.read.format("binaryFile").load(f"{shard_dir}/shard-*.tar")

    def _reader(it):
        import io
        import tarfile

        import pandas as pd

        for pdf in it:
            out = {"key": [], "payload": [], "meta": [], "shard": [], "shard_path": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tar$", path)
                shard = int(m.group(1)) if m else -1
                tf = tarfile.open(fileobj=io.BytesIO(bytes(content)), mode="r")
                pending: dict[str, bytes] = {}
                for info in tf:
                    if not info.isfile():
                        continue
                    name = info.name
                    blob = tf.extractfile(info).read()
                    if name.endswith(".json"):
                        key = name[: -len(".json")]
                        if key not in pending:
                            raise ValueError(
                                f"{path}: json member {name} without payload"
                            )
                        out["key"].append(key)
                        out["payload"].append(pending.pop(key))
                        out["meta"].append(blob.decode("utf-8"))
                        out["shard"].append(shard)
                        out["shard_path"].append(path)
                    elif name.endswith(f".{payload_ext}"):
                        key = name[: -(len(payload_ext) + 1)]
                        pending[key] = blob
                    else:
                        raise ValueError(f"{path}: unexpected member {name}")
                if pending:
                    raise ValueError(
                        f"{path}: payload members without json: {sorted(pending)[:3]}"
                    )
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(_reader, schema=_SAMPLE_SCHEMA)
