"""WebDataset-style POSIX-tar shard source — the container format
large multimodal training pipelines actually ship samples in (a
shard is one ``.tar`` whose members are grouped into samples by
basename: ``000017.txt`` + ``000017.json`` + ``000017.jpg`` is ONE
sample with three parts), parsed pure-stdlib.

WebDataset contract implemented here:
- sample key = member basename up to the FIRST dot (so
  ``000017.seg.png`` has key ``000017`` and part name ``seg.png``);
- a sample's members are stored adjacently in the shard; samples are
  emitted in shard order (first-seen key order);
- directory prefixes inside the tar are ignored for the key (a
  shard re-packed under a subdir yields the same samples).

Scale notes: the SHARD is the unit of parallelism — tar is
sequential-read-only, so WebDataset pipelines scale by having many
shards (thousands of ~1 GB files), shuffling at the shard level and
streaming members within a shard. ``wds_samples`` mirrors that:
Spark's ``binaryFile`` source assigns whole shards to tasks and
:func:`parse_tar_samples` streams each one inside ``mapInPandas``;
sample payloads never hit the driver. A malformed shard degrades to
one ok=false row, never a stage crash. At 100 TB the shard listing
itself is the scan-planning input (millions of files → use a
manifest table instead of a filesystem glob; the parse stage is
unchanged).

Reference parity: the reference's file-based sources land whole
files then load them row-wise (ods-v3-dbt dags/utils file loaders);
this module is the same files-are-the-unit contract applied to the
tar container, which the reference does not cover — it belongs to
the beyond-reference training-data surface (BASELINE.json).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WDS_SCHEMA = (
    "path string, sample_idx int, key string, n_parts int, "
    "part_names array<string>, part_sizes array<long>, "
    "first_offset long, parts map<string, binary>, "
    "ok boolean, error string"
)


def build_tar_shard(samples: list[dict[str, bytes | str]]) -> bytes:
    """Assemble a deterministic WebDataset shard: one tar member per
    non-``__key__`` entry of each sample dict, named
    ``{__key__}.{part}``, in sample order then sorted part order.
    Headers are bit-stable (mtime 0, uid/gid 0, blank names, USTAR
    format) so identical inputs give identical shard bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for s in samples:
            key = s["__key__"]
            for part in sorted(k for k in s if k != "__key__"):
                data = s[part]
                if isinstance(data, str):
                    data = data.encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{part}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def parse_tar_samples(payload: bytes) -> list[dict]:
    """Parse a tar shard → samples in shard order:
    ``[{key, parts: {name: bytes}, sizes: {name: int},
    first_offset}]``. ``first_offset`` is the byte offset of the
    sample's first member HEADER within the shard (tar members are
    512-byte-aligned: header block + ceil(size/512) data blocks) —
    exposing it makes block-padding arithmetic externally checkable.
    Raises ``ValueError`` on malformed tars."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:*")
    except tarfile.TarError as e:  # normalize for the ok=false path
        raise ValueError(f"bad tar: {e}") from e
    samples: list[dict] = []
    by_key: dict[str, dict] = {}
    try:
        for member in tf:
            if not member.isfile():
                continue
            base = member.name.rsplit("/", 1)[-1]
            if "." in base:
                key, part = base.split(".", 1)
            else:
                key, part = base, ""
            data = tf.extractfile(member).read()
            if len(data) != member.size:
                raise ValueError(f"truncated member {member.name}")
            s = by_key.get(key)
            if s is None:
                s = {
                    "key": key,
                    "parts": {},
                    "sizes": {},
                    # header offset, not offset_data: the closed form
                    # "sum of 512 + 512*ceil(size/512) over prior
                    # members" starts at the header block
                    "first_offset": member.offset,
                }
                by_key[key] = s
                samples.append(s)
            s["parts"][part] = data
            s["sizes"][part] = member.size
    except tarfile.TarError as e:
        raise ValueError(f"bad tar: {e}") from e
    return samples


def wds_samples(spark: SparkSession, path_glob: str) -> DataFrame:
    """Spark source over WebDataset shards: ``binaryFile`` lists and
    partitions whole shard files; each task parses its shards with
    :func:`parse_tar_samples` and emits one row per sample. Column
    pruning still applies upstream of the parse (binaryFile reads
    the content column only when referenced)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path", "sample_idx", "key", "n_parts", "part_names",
            "part_sizes", "first_offset", "parts", "ok", "error",
        ]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    for i, s in enumerate(parse_tar_samples(bytes(r["content"]))):
                        names = sorted(s["parts"])
                        out.append(
                            (
                                r["path"], i, s["key"], len(names), names,
                                [s["sizes"][n] for n in names],
                                s["first_offset"],
                                {n: s["parts"][n] for n in names},
                                True, None,
                            )
                        )
                except (ValueError, KeyError) as e:
                    out.append(
                        (r["path"], 0, None, 0, [], [], None, {}, False, str(e))
                    )
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(parse, schema=WDS_SCHEMA)


def write_wds_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    key_col: str = "key",
    part_cols: tuple[str, ...] = ("txt",),
) -> DataFrame:
    """Export a DataFrame AS WebDataset shards — the other half of
    the contract: one ``.tar`` per ``shard_col`` group written by
    the executor that owns the group (workers stream to shared
    storage — the standard WebDataset export shape; nothing funnels
    through the driver), samples in ``key_col`` order, one member
    per ``part_cols`` entry (bytes passed through, anything else
    UTF-8 encoded).

    Each shard is written to ``shard-{id:06d}.tar`` via a temp file
    + ``os.replace`` so a task retry republishes the identical file
    atomically instead of corrupting a half-written shard (the
    builder is deterministic, so retries are idempotent).

    Returns the shard MANIFEST (shard_id, path, n_samples, n_bytes)
    — at 100 TB the manifest table, not a filesystem glob, is what
    downstream reads plan against (see SCALE.md)."""
    import os

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col)
        samples = []
        for _, r in pdf.iterrows():
            s: dict = {"__key__": str(r[key_col])}
            for p in part_cols:
                v = r[p]
                s[p] = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
            samples.append(s)
        payload = build_tar_shard(samples)
        sid = int(pdf[shard_col].iloc[0])
        path = os.path.join(out_dir, f"shard-{sid:06d}.tar")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "path": [path],
                "n_samples": [len(samples)],
                "n_bytes": [len(payload)],
            }
        )

    return df.groupBy(shard_col).applyInPandas(
        pack, schema="shard_id long, path string, n_samples long, n_bytes long"
    )


def wds_shards_takedown(
    spark: SparkSession,
    path_glob: str,
    keys: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Remove samples by ``__key__`` from WebDataset shards,
    rewriting ONLY the shards that contain them — the multimodal arm
    of the round-7 takedown family (``pipelines.corpus_takedown``
    covers text corpora + indexes; a 100 TB multimodal corpus lives
    as tar shards, and a takedown that re-packed every shard would
    be a full-corpus rewrite).

    Two passes, both shard-parallel:

    1. IDENTIFY — a header-only scan (tar headers are 512-byte
       blocks; member payloads are skipped, though ``binaryFile``
       still ships whole shard bytes to the task) maps shard →
       sample keys; shards intersecting the takedown set survive to
       pass 2, everything else is UNTOUCHED byte-for-byte;
    2. REWRITE — each affected shard re-packs its surviving samples
       with the deterministic :func:`build_tar_shard` builder and
       swaps in place via temp-file + ``os.replace`` (the writer's
       atomicity discipline: a task retry republishes an identical
       file; readers see the old complete shard or the new complete
       shard, never a torn one).

    Idempotent — a replay finds no shard containing the keys and
    rewrites nothing. The rewrite pass is MATERIALIZED inside this
    call (the receipts are collected and returned as a small local
    DataFrame): a compliance primitive must not be a lazy side
    effect of whether the caller happens to evaluate the returned
    plan — an unactioned return would remove nothing, and every
    re-evaluation would re-run executor-local file writes (round-7
    ADVICE, this file). The collect is bounded by the AFFECTED shard
    count (O(takedown batch), never the corpus). Returns the receipt
    (path, n_removed, n_samples_after, n_bytes_after); a shard whose
    samples are ALL taken down rewrites to an empty tar (two zero
    blocks) and reports n_samples_after=0 — dropping the file itself
    is the caller's manifest-level decision."""
    dead = {str(r[0]) for r in keys.select(key_col).distinct().collect()}
    if not dead:
        return spark.createDataFrame(
            [], "path string, n_removed long, n_samples_after long, "
                "n_bytes_after long"
        )
    files = spark.read.format("binaryFile").load(path_glob)

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hits = []
            for _, row in pdf.iterrows():
                try:
                    tf = tarfile.open(
                        fileobj=io.BytesIO(bytes(row["content"])), mode="r:*"
                    )
                    for member in tf:
                        base = member.name.rsplit("/", 1)[-1]
                        key = base.split(".", 1)[0] if "." in base else base
                        if key in dead:
                            hits.append(row["path"])
                            break
                except tarfile.TarError:
                    continue  # malformed shards are the reader's ok=false rows
            yield pd.DataFrame({"path": hits})

    affected = (
        files.select("path", "content")
        .mapInPandas(find, schema="path string")
        .localCheckpoint()
    )

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            out = {"path": [], "n_removed": [], "n_samples_after": [],
                   "n_bytes_after": []}
            for _, row in pdf.iterrows():
                samples = parse_tar_samples(bytes(row["content"]))
                keep = [s for s in samples if s["key"] not in dead]
                payload = build_tar_shard(
                    [{"__key__": s["key"], **s["parts"]} for s in keep]
                )
                from urllib.parse import urlparse

                path = row["path"]
                parsed = urlparse(path)
                local = parsed.path if parsed.scheme else path
                tmp = f"{local}.tmp-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, local)
                out["path"].append(path)
                out["n_removed"].append(len(samples) - len(keep))
                out["n_samples_after"].append(len(keep))
                out["n_bytes_after"].append(len(payload))
            yield pd.DataFrame(out)

    schema = (
        "path string, n_removed long, n_samples_after long, "
        "n_bytes_after long"
    )
    # Execute the rewrites NOW (exactly once) and hand back the
    # collected receipts — affected-shard-bounded, never corpus-sized.
    receipts = (
        files.join(affected, "path", "left_semi")
        .select("path", "content")
        .mapInPandas(rewrite, schema=schema)
        .collect()
    )
    return spark.createDataFrame(receipts, schema)
