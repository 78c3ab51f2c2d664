"""Versioned parquet table: manifests, time travel, atomic commits.

``sinks.cowtable`` gives MERGE over plain hive-layout parquet but
mutates files in place — once a partition rewrites, its old rows are
gone, a multi-partition merge is not atomic, and two concurrent
writers corrupt each other. This module adds the missing lakehouse
properties with nothing but parquet + a JSON manifest per version
(the same design center as Delta/Iceberg, reduced to its core):

- **immutable data files**: every commit writes NEW files under
  ``data/<commit-uuid>/``; nothing is ever modified or deleted by a
  write (only :func:`vacuum_versioned_table` removes unreferenced
  commits).
- **atomic version swap**: a commit becomes visible by publishing
  ``_manifests/v<N>.json`` through an atomic-exclusive primitive —
  hard-link creation on ``file://`` (POSIX ``link(2)`` fails EEXIST
  atomically; plain ``rename(2)`` would silently REPLACE a concurrent
  winner's manifest) and rename-without-overwrite on HDFS (where
  rename refuses existing destinations). Readers see either version
  N-1 or N, never a half-merged table — multi-partition merges are
  transactions here, which the CoW module explicitly cannot offer.
  (On S3, swap the publication for a conditional PUT — the protocol
  is unchanged.)
- **optimistic concurrency**: two concurrent merges both prepare data
  dirs, but only one wins the rename; the loser re-reads the new
  latest version and retries its merge against it. The orphaned data
  dir of the losing attempt is invisible (no manifest references it)
  and reclaimed by vacuum.
- **time travel**: ``read_versioned_table(path, version=N)`` — every
  manifest pins the exact directory set of its version, so historical
  reads cost the same as current ones. A merge that empties a
  partition simply drops its manifest entry; version N-1 still reads
  the old files.

Manifest entries map partition values to the commit-relative
directory holding exactly that partition's files (one partition per
directory — the ``partitionBy`` write layout guarantees it), so
partition pruning is a manifest filter, no file-system listing.
Reads union one plain scan per manifest entry and attach the entry's
partition values as typed literals — directory-name inference is never
consulted (it types by value: a string partition '01' would come back
as the number 1). Partition values must be JSON-serializable
primitives (str/int/bool/None).
"""

from __future__ import annotations

import json
import re
import time
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.merge import merge_upsert

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class VersionedTableError(RuntimeError):
    pass


def _jfs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs


def _escape(spark: SparkSession):
    return spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName


def _partition_subdir(spark: SparkSession, part: dict, partition_by: Sequence[str]) -> str:
    esc = _escape(spark)

    def fmt(v) -> str:
        if v is None:
            return "__HIVE_DEFAULT_PARTITION__"
        if isinstance(v, bool):  # Spark writes booleans lowercase
            return "true" if v else "false"
        return esc(str(v))

    return "/".join(f"{c}={fmt(part[c])}" for c in partition_by)


def _check_partition_values(parts: list[dict]) -> None:
    for p in parts:
        for c, v in p.items():
            if v is not None and not isinstance(v, (str, int, bool)):
                raise VersionedTableError(
                    f"partition value {c}={v!r} is not a JSON-serializable primitive"
                )
            # hive layout cannot carry these: Spark writes '' as the
            # null-sentinel directory (colliding with None — the
            # manifest would point at a dir that does not exist), and
            # a literal sentinel string reads back as null. Reject at
            # write instead of corrupting at read (r11; pre-existing —
            # the old per-entry reader hit PATH_NOT_FOUND on '').
            if v == "" or v == "__HIVE_DEFAULT_PARTITION__":
                raise VersionedTableError(
                    f"partition value {c}={v!r} cannot round-trip hive "
                    "layout (conflates with the null sentinel); use None "
                    "or a non-empty marker"
                )


def _manifest_path(path: str, version: int) -> str:
    return f"{path}/{_MANIFEST_DIR}/v{version:010d}.json"


def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> bool:
    """Atomically publish ``manifest`` as its version; False if that
    version already exists (another writer won the race)."""
    return _atomic_create_json(
        spark, path, _manifest_path(path, manifest["version"]), manifest
    )


def _atomic_create_json(spark: SparkSession, path: str, target_str: str, obj: dict) -> bool:
    """Atomically create ``target_str`` holding ``obj`` as JSON; False
    if the file already exists (another writer won the race)."""
    jvm, fs = _jfs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(target_str)
    fs.mkdirs(target.getParent())
    if fs.exists(target):
        return False
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{target.getParent().toString()}/.tmp-{uuid.uuid4().hex}.json"
    )
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()
    # Atomic publication + optimistic lock. The obvious fs.rename is
    # NOT safe on LocalFileSystem: it bottoms out in POSIX rename(2),
    # which silently REPLACES an existing destination and returns
    # true — two racing writers would both "win" and one commit would
    # vanish. On file:// we therefore claim the version with a hard
    # LINK (link(2) fails with EEXIST atomically); on HDFS rename
    # refuses existing destinations and is the sanctioned primitive.
    # On S3, swap this for a conditional PUT (If-None-Match).
    scheme = fs.getUri().getScheme()
    if scheme == "file":
        # java.nio.file.Paths.get is varargs (py4j can't call it);
        # java.io.File(...).toPath() reaches the same Path
        def nio_path(p):
            return jvm.java.io.File(p.toUri().getPath()).toPath()

        try:
            jvm.java.nio.file.Files.createLink(nio_path(target), nio_path(tmp))
            ok = True
        except Exception as e:
            jexc = getattr(e, "java_exception", None)
            name = jexc.getClass().getName() if jexc is not None else ""
            if name != "java.nio.file.FileAlreadyExistsException":
                fs.delete(tmp, False)
                raise
            ok = False  # lost the race
        fs.delete(tmp, False)
    else:
        ok = bool(fs.rename(tmp, target))
        if not ok:
            fs.delete(tmp, False)
    return ok


_TAGS_DIR = "_tags"
_TAG_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def _tag_path(path: str, tag: str) -> str:
    return f"{path}/{_TAGS_DIR}/{tag}.json"


def create_tag(
    spark: SparkSession,
    path: str,
    tag: str,
    version: int | None = None,
    *,
    replace: bool = False,
) -> int:
    """Pin a NAMED TAG to a table version (default: latest) — the
    human-readable time-travel ref ("v2024-training-cut") every
    lakehouse grows: reads resolve it (``read_versioned_table(...,
    tag=...)``) and vacuum treats tagged versions as retained, so a
    tagged snapshot stays readable no matter how many versions land
    after it. Tags are immutable by default (atomic create-once, the
    manifest race rules); ``replace=True`` retargets via delete +
    re-create (NOT atomic — concurrent readers may briefly see the tag
    missing; use a new tag name when that matters). Returns the pinned
    version."""
    if not _TAG_NAME_RE.match(tag):
        raise VersionedTableError(
            f"invalid tag name {tag!r} (alnum start, then [A-Za-z0-9._-], max 64)"
        )
    v = latest_version(spark, path) if version is None else version
    _read_manifest(spark, path, v)  # must exist
    if replace:
        delete_tag(spark, path, tag, missing_ok=True)
    if not _atomic_create_json(
        spark, path, _tag_path(path, tag), {"tag": tag, "version": v}
    ):
        raise VersionedTableError(
            f"tag {tag!r} already exists (use replace=True to retarget)"
        )
    return v


def resolve_tag(spark: SparkSession, path: str, tag: str) -> int:
    jvm, fs = _jfs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(_tag_path(path, tag))
    if not fs.exists(target):
        raise VersionedTableError(f"tag {tag!r} does not exist at {path}")
    stream = fs.open(target)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return int(json.loads(text)["version"])


def list_tags(spark: SparkSession, path: str) -> dict[str, int]:
    """All tags as {name: version}."""
    jvm, fs = _jfs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/{_TAGS_DIR}")
    if not fs.exists(root):
        return {}
    out: dict[str, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith(".tmp-"):
            out[name[:-5]] = resolve_tag(spark, path, name[:-5])
    return dict(sorted(out.items()))


def delete_tag(
    spark: SparkSession, path: str, tag: str, *, missing_ok: bool = False
) -> None:
    jvm, fs = _jfs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(_tag_path(path, tag))
    if not fs.exists(target):
        if missing_ok:
            return
        raise VersionedTableError(f"tag {tag!r} does not exist at {path}")
    fs.delete(target, False)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    jvm, fs = _jfs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    if not fs.exists(target):
        raise VersionedTableError(f"version {version} does not exist at {path}")
    stream = fs.open(target)
    try:
        # py4j passes byte arrays BY VALUE — a JVM read(buf) fills a
        # copy, not the Python bytearray — so drain JVM-side
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def list_versions(spark: SparkSession, path: str) -> list[int]:
    jvm, fs = _jfs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    versions = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            versions.append(int(name[1:-5]))
    return sorted(versions)


def latest_version(spark: SparkSession, path: str) -> int:
    versions = list_versions(spark, path)
    if not versions:
        raise VersionedTableError(f"no versioned table at {path}")
    return versions[-1]


#: column types that get zone-map (min/max) statistics. Orderable,
#: JSON-serializable after _stat_norm; decimals/arrays/structs are
#: deliberately excluded (stats are an optimization — a column without
#: them is simply never skipped on).
_STAT_TYPES = frozenset(
    {
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "string", "date", "timestamp", "timestamp_ntz",
    }
)


def _stat_norm(v):
    """Stats value -> JSON-serializable form. Temporal values become
    ISO strings with a space separator (lexicographic order == temporal
    order, and the format matches SQL literals like
    '2024-01-15 00:00:00' so user bounds compare directly)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


#: Bloom filter shape for the per-file point-lookup index. Fixed in
#: code (recorded per manifest so a future change stays readable):
#: m bits / k salted md5 hashes -> ~1.5% false-positive rate at
#: ~200 distinct keys per file, and a positions list that stays small
#: in the manifest JSON.
_BLOOM_M = 2048
_BLOOM_K = 3


def _bloom_position_cols(col, m: int = _BLOOM_M, k: int = _BLOOM_K) -> list:
    """The k salted-md5 bit positions of a value — the Spark twin of
    :func:`_bloom_positions_py` (both sides MUST hash identically)."""
    from ..functions.columns import md5_prefix_int

    return [
        (
            md5_prefix_int(F.concat(F.lit(f"b{i}:"), col.cast("string")))
            .cast("bigint")
            % m
        )
        for i in range(k)
    ]


def _bloom_positions_py(value, m: int = _BLOOM_M, k: int = _BLOOM_K) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"b{i}:{value}".encode("utf-8")).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


def _attach_file_stats(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    partition_by: Sequence[str],
    bloom_cols: Sequence[str] = (),
) -> None:
    """Record per-FILE statistics on each new manifest entry — the
    layer behind ``read_versioned_table`` data skipping. ONE job over
    the just-written commit (page-cache warm); the collect is one row
    per file (metadata, never data).

    - min/max zone maps for every _STAT_TYPES column
      (``range_filter`` skipping);
    - for ``bloom_cols``, a Bloom bit-position set (``point_filter``
      skipping — equality lookups on high-cardinality columns where a
      wide [min,max] proves nothing).
    Columns outside _STAT_TYPES simply get no stats."""
    if not entries:
        return
    probe = spark.read.parquet(f"{path}/{entries[0]['dir']}")
    stat_cols = [
        f.name for f in probe.schema.fields if f.dataType.simpleString() in _STAT_TYPES
    ]
    bloom_cols = [c for c in bloom_cols if c in probe.columns]
    if not stat_cols and not bloom_cols:
        # record NOTHING rather than empty lists: the read path treats
        # a missing/empty files list as "no information, read the whole
        # dir" — an empty list must never look like "all files skipped"
        # (r4 review finding: silent zero-row reads on stat-less tables)
        return
    dirs = {e["dir"]: e for e in entries}
    for e in entries:
        e["files"] = []
    df = spark.read.parquet(*[f"{path}/{d}" for d in dirs])
    file_recs: dict[str, dict] = {}
    # count(*) seeds the record for EVERY file, so a file whose bloom
    # column is entirely null (absent from the bloom pass) still gets a
    # manifest record — an unlisted file would silently vanish from
    # filtered reads
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    for r in df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect():
        file_recs[r["__f"]] = {
            "stats": {
                c: [_stat_norm(r[f"__mn_{c}"]), _stat_norm(r[f"__mx_{c}"])]
                for c in stat_cols
            }
        }
    # Bloom positions via explode -> collect_set: partial aggregation
    # bounds the per-(file, column) buffer at _BLOOM_M distinct
    # positions, where collect_list of per-row arrays would buffer
    # O(rows) before the dedup (r4 review finding). ALL bloom columns
    # ride ONE job — tagged (column, position) structs in a single
    # explode — instead of one commit-dir scan per column.
    if bloom_cols:
        tagged = [
            F.struct(F.lit(c).alias("c"), p.alias("p"))
            for c in bloom_cols
            for p in _bloom_position_cols(F.col(c))
        ]
        pos = (
            df.select(
                F.input_file_name().alias("__f"),
                F.explode(F.array(*tagged)).alias("__cp"),
            )
            .where(F.col("__cp.p").isNotNull())
            .groupBy("__f", "__cp.c")
            .agg(F.sort_array(F.collect_set("__cp.p")).alias("__ps"))
        )
        for r in pos.collect():
            file_recs.setdefault(r["__f"], {"stats": {}}).setdefault("bloom", {})[
                r["c"]
            ] = [int(p) for p in r["__ps"]]
        # files whose column is entirely null get an empty position set
        # (present-but-empty = proof of absence for every probe value)
        for rec in file_recs.values():
            for c in bloom_cols:
                rec.setdefault("bloom", {}).setdefault(c, [])
    for fpath, rec in file_recs.items():
        for d, e in dirs.items():
            marker = f"/{d}/"
            if marker in fpath:
                entry_rec = {"name": fpath.split(marker, 1)[1], "stats": rec["stats"]}
                if bloom_cols:
                    entry_rec["bloom"] = rec["bloom"]
                e["files"].append(entry_rec)
                break
    for e in entries:
        e["files"].sort(key=lambda f: f["name"])


def _commit_data(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    bloom_cols: Sequence[str] = (),
) -> tuple[str, list[dict]]:
    """Write ``df`` as a new immutable commit dir; return (commit id,
    manifest entries — with per-file zone maps and Bloom indexes — for
    the partitions it contains)."""
    commit = uuid.uuid4().hex
    df.write.partitionBy(*list(partition_by)).parquet(f"{path}/{_DATA_DIR}/{commit}")
    spark = df.sparkSession
    parts = [r.asDict() for r in df.select(*partition_by).distinct().collect()]
    _check_partition_values(parts)
    entries = [
        {
            "partition": p,
            "dir": f"{_DATA_DIR}/{commit}/{_partition_subdir(spark, p, partition_by)}",
        }
        for p in parts
    ]
    _attach_file_stats(spark, path, entries, partition_by, bloom_cols)
    return commit, entries


def create_versioned_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    *,
    bloom_cols: Sequence[str] = (),
) -> int:
    """Write the initial snapshot as version 1.

    ``bloom_cols`` opts named columns into the per-file Bloom
    point-lookup index (recorded in the manifest; every later merge and
    compaction maintains it). Use it for high-cardinality equality-
    lookup columns — ids, keys — where min/max zone maps prove nothing.

    The input is materialized (``localCheckpoint``) before the commit:
    ``_commit_data`` computes the frame twice (files + partition set),
    and a non-deterministic input (sampling, rand-derived columns)
    could otherwise produce a manifest that disagrees with the files
    on disk."""
    if not partition_by:
        raise VersionedTableError("partition_by must be non-empty")
    unknown = set(bloom_cols) - set(df.columns)
    if unknown:
        raise VersionedTableError(f"bloom_cols not in table: {sorted(unknown)}")
    # the probe-side hash renders values with Python str() while the
    # build side uses Spark's cast-to-string; those agree ONLY for
    # strings and integers (booleans: 'True' vs 'true'; large doubles:
    # '10000000.0' vs '1.0E7') — a mismatch silently turns "proof of
    # absence" into false absence, so refuse other types up front
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = [
        c for c in bloom_cols
        if types[c] not in ("string", "tinyint", "smallint", "int", "bigint")
    ]
    if bad:
        raise VersionedTableError(
            f"bloom_cols must be string/integer columns: {bad} "
            f"({[types[c] for c in bad]})"
        )
    spark = df.sparkSession
    _, entries = _commit_data(
        df.localCheckpoint(eager=True), path, partition_by, list(bloom_cols)
    )
    manifest = {
        "version": 1,
        "ts": time.time(),
        "schema": df.schema.json(),
        "partition_by": list(partition_by),
        "entries": entries,
        "txns": {},
        "bloom_cols": list(bloom_cols),
    }
    if not _write_manifest(spark, path, manifest):
        raise VersionedTableError(f"table already exists at {path}")
    return 1


def _bound_norm(v, col_type: str = ""):
    """User-supplied range bound -> the zone-map comparison domain,
    matching BOTH the stored stats format and the row filter's implicit
    cast semantics (``col <op> lit(bound)``). The trap is strict-prefix
    lexicographic comparisons (r4 review findings):

    - TIMESTAMP column: stats are 'YYYY-MM-DD HH:MM:SS[.ffffff]'. A
      coarser bound (date, or a day/minute-grained string) must pad to
      full seconds, or '2024-01-15' sorts BELOW the file's midnight
      stat and falsely skips it. Spark's row filter promotes date ->
      midnight timestamp and parses partial strings the same way.
    - DATE column: stats are 'YYYY-MM-DD'. Spark compares date-vs-
      string by casting the STRING TO DATE (truncating any time part),
      so string bounds truncate to the day here too; a datetime bound
      keeps its time (date promotes to timestamp in the row filter)
      EXCEPT exact midnight, which must collapse to the day string or
      it sorts above the equal date stat and falsely skips.

    Every string rewrite above is gated on TEMPORAL col_type: a bound
    on a plain STRING column is returned verbatim — the 'T' -> ' '
    rewrite would otherwise lexicographically LOWER any bound
    containing 'T' (' ' sorts below every printable char: 'Tom' ->
    ' om' < 'Bob') and falsely prune files, silently dropping rows
    (r4 advice, high)."""
    import datetime as _dt

    if col_type.startswith("timestamp") and isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        v = _dt.datetime.combine(v, _dt.time())
    if (
        col_type == "date"
        and isinstance(v, _dt.datetime)
        and v.time() == _dt.time()
    ):
        v = v.date()
    normed = _stat_norm(v)
    temporal = col_type.startswith("timestamp") or col_type == "date"
    if isinstance(normed, str) and temporal:
        # tolerate '2024-01-15T00:00:00' for a stat stored with ' '
        normed = normed.replace("T", " ")
        if col_type.startswith("timestamp"):
            if len(normed) == 10:
                normed += " 00:00:00"
            elif len(normed) == 13:  # 'YYYY-MM-DD HH'
                normed += ":00:00"
            elif len(normed) == 16:  # 'YYYY-MM-DD HH:MM'
                normed += ":00"
        elif col_type == "date":
            normed = normed[:10]  # the row filter casts string -> date
    return normed


def _file_survives(stats: dict, range_filter_norm: dict) -> bool:
    """Conservative zone-map check: keep the file unless some bound
    PROVES it empty. Column absent from stats -> keep (stats are an
    optimization, never a correctness dependency); [None, None] stats
    mean the column is entirely null in the file, and a range predicate
    drops null rows — provably empty, skip."""
    for c, (lo, hi) in range_filter_norm.items():
        if c not in stats:
            continue
        mn, mx = stats[c]
        if mn is None and mx is None:
            return False
        if lo is not None and mx is not None and mx < lo:
            return False
        if hi is not None and mn is not None and mn > hi:
            return False
    return True


def read_versioned_table(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    tag: str | None = None,
    partition_filter: dict | None = None,
    range_filter: dict | None = None,
    point_filter: dict | None = None,
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). Historical
    versions read their original immutable files — time travel.

    ``partition_filter`` prunes at the MANIFEST: only entries whose
    partition values match every given column are read — no
    file-system listing, no scan of non-matching partitions (the
    manifest is the table's statistics layer, same as a lakehouse
    format's metadata pruning).

    ``range_filter`` = ``{col: (lo, hi)}`` (either bound may be None)
    applies a BETWEEN predicate with three-level pruning: manifest
    entries, then individual FILES via the per-file zone maps recorded
    at commit time, then the row-level filter for exactness. Skipping
    is conservative — a file is dropped only when its min/max PROVE it
    cannot match — so the result is always identical to a full scan
    plus filter; entries from pre-zone-map manifests (no ``files`` key)
    just read whole. Pair with Z-order compaction
    (``compact_versioned_table(zorder_by=...)``) to make the per-file
    ranges tight on multiple columns at once.

    ``point_filter`` = ``{col: value}`` applies an equality predicate
    with per-file BLOOM skipping for columns the table was created with
    ``bloom_cols=[...]`` — the point-lookup complement to zone maps (a
    scattered high-cardinality key has useless min/max but a decisive
    Bloom test). Same conservative contract: Bloom false positives are
    read and row-filtered away; a negative is proof of absence.
    Columns without a Bloom index still filter correctly, just without
    the skip.

    ``tag`` reads AS OF a named tag (see :func:`create_tag`); mutually
    exclusive with ``version``."""
    if tag is not None:
        if version is not None:
            raise VersionedTableError("pass version OR tag, not both")
        version = resolve_tag(spark, path, tag)
    v = latest_version(spark, path) if version is None else version
    m = _read_manifest(spark, path, v)
    schema = StructType.fromJson(json.loads(m["schema"]))
    entries = m["entries"]
    if partition_filter:
        unknown = set(partition_filter) - set(m["partition_by"])
        if unknown:
            raise VersionedTableError(f"not partition columns: {sorted(unknown)}")

        def _part_matches(have, want) -> bool:
            # a list/tuple/set of values is IN semantics — the shape a
            # multi-cell index probe needs (e.g. an IVF query batch
            # pruning to its n_probe*|batch| probed cells); a scalar
            # stays equality
            if isinstance(want, (list, tuple, set, frozenset)):
                return have in want
            return have == want

        entries = [
            e
            for e in entries
            if all(
                _part_matches(e["partition"].get(c), v_)
                for c, v_ in partition_filter.items()
            )
        ]
    def _check_filter_cols(cols, which: str) -> None:
        unknown = set(cols) - {f.name for f in schema.fields}
        if unknown:
            raise VersionedTableError(f"not table columns: {sorted(unknown)}")
        if set(cols) & set(m["partition_by"]):
            raise VersionedTableError(
                f"{which} on partition columns — use partition_filter"
            )

    def _prune(entries_in: list[dict], survives) -> list[dict]:
        """Shared skip loop: missing/EMPTY file lists mean 'no
        information, read the whole dir'; an entry survives with the
        subset of files the predicate cannot rule out."""
        pruned = []
        for e in entries_in:
            files = e.get("files") or None
            if files is None:
                pruned.append(e)
                continue
            kept = [f for f in files if survives(f)]
            if kept:
                e2 = dict(e)
                e2["files"] = kept
                pruned.append(e2)
        return pruned

    use_file_lists = False
    col_types = {f.name: f.dataType.simpleString() for f in schema.fields}
    if range_filter:
        _check_filter_cols(range_filter, "range_filter")
        # validate bound types UP FRONT (as point_filter does): a
        # mistyped bound would otherwise surface as an uncontextualized
        # TypeError from the raw </> inside the prune loop (r4 advice)
        import datetime as _dt

        for c, (lo, hi) in range_filter.items():
            dt = col_types[c]
            for bound in (lo, hi):
                if bound is None:
                    continue
                if dt == "string":
                    ok = isinstance(bound, str)
                elif dt.startswith("timestamp") or dt == "date":
                    ok = isinstance(bound, (str, _dt.date, _dt.datetime))
                else:  # numeric families (int/bigint/double/decimal...)
                    ok = isinstance(bound, (int, float)) and not isinstance(bound, bool)
                if not ok:
                    raise VersionedTableError(
                        f"range_filter[{c!r}] bound {bound!r} has type "
                        f"{type(bound).__name__}, not comparable to column "
                        f"type {dt}"
                    )
        norm = {
            c: (_bound_norm(lo, col_types[c]), _bound_norm(hi, col_types[c]))
            for c, (lo, hi) in range_filter.items()
        }
        entries = _prune(entries, lambda f: _file_survives(f["stats"], norm))
        use_file_lists = True
    if point_filter:
        _check_filter_cols(point_filter, "point_filter")
        indexed = set(m.get("bloom_cols", [])) & set(point_filter)
        if indexed:
            # the probe hash must render the value EXACTLY as the build
            # side's cast-to-string did: require the probe's Python type
            # to match the column type (a float probe on a bigint column
            # or a zero-padded string would hash differently and turn
            # proof-of-absence into false absence — r4 review finding)
            for c in indexed:
                val, dt = point_filter[c], col_types[c]
                if dt == "string" and not isinstance(val, str):
                    raise VersionedTableError(
                        f"point_filter[{c!r}] must be a str (column is string)"
                    )
                if dt != "string" and not (
                    isinstance(val, int) and not isinstance(val, bool)
                ):
                    raise VersionedTableError(
                        f"point_filter[{c!r}] must be an int (column is {dt})"
                    )
            want = {c: _bloom_positions_py(point_filter[c]) for c in indexed}
            entries = _prune(
                entries,
                lambda f: all(
                    "bloom" not in f
                    or c not in f["bloom"]
                    or all(p in f["bloom"][c] for p in pos)
                    for c, pos in want.items()
                ),
            )
            use_file_lists = True
    df = _read_entries(
        spark, path, entries, schema, list(m["partition_by"]),
        use_file_lists=use_file_lists,
    )
    if range_filter:
        for c, (lo, hi) in range_filter.items():
            if lo is not None:
                df = df.where(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.where(F.col(c) <= F.lit(hi))
    if point_filter:
        for c, val in point_filter.items():
            df = df.where(F.col(c) == F.lit(val))
    return df


def _read_entries(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    schema: StructType,
    partition_by: list[str],
    *,
    use_file_lists: bool = False,
) -> DataFrame:
    """Union one plain scan per manifest entry. Partition values come
    from the MANIFEST, never from directory-name inference: Spark's
    basePath inference types by value, so a STRING partition value like
    '01' would come back as long 1 and a cast to the recorded schema
    would yield '1' — silent corruption. Each entry's dir is read plain
    (data files carry no partition columns) and the entry's recorded
    values attach as typed literals."""
    if not entries:
        return spark.createDataFrame([], schema)
    field_by_name = {f.name: f for f in schema.fields}
    # data files carry the table schema MINUS the partition columns
    # (written via partitionBy); pin it explicitly so each scan is
    # listing-only — unpinned, spark.read.parquet does a driver-side
    # footer read PER ENTRY for schema inference, which turns a
    # 12-entry pruned read into ~30s of planning (r11 finding while
    # timing the BM25 posting reads). Files from before an add-only
    # evolution simply lack the new column and read as typed nulls —
    # the same contract the inference path provided.
    data_schema = StructType(
        [f for f in schema.fields if f.name not in set(partition_by)]
    )

    def _attach_literals(piece: DataFrame, part: dict) -> DataFrame:
        for c in partition_by:
            piece = piece.withColumn(
                c, F.lit(part[c]).cast(field_by_name[c].dataType)
            )
        return piece

    # Entries from the SAME commit share one hive-layout parent
    # (data/<commit>/col=v/...), so they can read as ONE scan with the
    # commit dir as basePath and the USER-SUPPLIED schema typing the
    # partition columns — no directory-name type inference (the
    # corruption this module exists to avoid: by-value inference turns
    # a string partition '01' into the number 1; an explicit schema
    # parses the directory token AS the recorded type instead). This
    # collapses read planning from O(entries) to O(commits): a freshly
    # created 4096-cell inverted file is one commit = one scan, not
    # 4096 (r11 — per-entry planning was the versioned reader's real
    # scale ceiling). Per-entry fallback stays for: zone-map file
    # lists (per-file selection) and empty-string partition values
    # (hive writes '' as the null sentinel — only the manifest literal
    # preserves it). Pre-evolution commits (files missing a DATA
    # column of the current schema) take the grouped path SAFELY
    # because grouping is PER COMMIT: every file in one commit was
    # written by one atomic write against one schema, so the hive
    # reader's need for per-scan-uniform data columns is guaranteed by
    # the grouping unit itself, and the explicit schema null-fills the
    # missing column (r11 ADVICE: an earlier revision of this comment
    # claimed such commits stay per-entry — they don't need to).
    def _groupable(e: dict) -> bool:
        if use_file_lists and e.get("files") is not None:
            return False
        # '' writes as the hive null sentinel (only the manifest
        # literal preserves it); a literal sentinel STRING would read
        # back as null — both stay on the per-entry literal path
        return all(
            v != "" and v != "__HIVE_DEFAULT_PARTITION__"
            for v in e["partition"].values()
        )

    by_commit: dict[str, list[dict]] = {}
    singles: list[dict] = []
    for e in entries:
        d = e["dir"].split("/")
        if _groupable(e) and len(d) >= 2 and d[0] == _DATA_DIR:
            by_commit.setdefault("/".join(d[:2]), []).append(e)
        else:
            singles.append(e)

    pieces: list[DataFrame] = []
    hive_schema = StructType(
        list(data_schema.fields)
        + [field_by_name[c] for c in partition_by]
    )
    for commit_base in sorted(by_commit):
        group = sorted(by_commit[commit_base], key=lambda x: x["dir"])
        if len(group) == 1:
            piece = spark.read.schema(data_schema).parquet(
                f"{path}/{group[0]['dir']}"
            )
            pieces.append(_attach_literals(piece, group[0]["partition"]))
            continue
        piece = (
            spark.read.schema(hive_schema)
            .option("basePath", f"{path}/{commit_base}")
            .parquet(*[f"{path}/{e['dir']}" for e in group])
        )
        pieces.append(piece)
    for e in sorted(singles, key=lambda x: x["dir"]):
        if use_file_lists and e.get("files") is not None:
            # zone-map skipping selected a subset of the dir's files
            piece = spark.read.schema(data_schema).parquet(
                *[f"{path}/{e['dir']}/{f['name']}" for f in e["files"]]
            )
        else:
            piece = spark.read.schema(data_schema).parquet(f"{path}/{e['dir']}")
        pieces.append(_attach_literals(piece, e["partition"]))

    parts_df: DataFrame | None = None
    for piece in pieces:
        # schema evolution: files written before a column was added
        # simply lack it — read it as typed nulls (add-only evolution,
        # the same contract parquet mergeSchema provides)
        for f in schema.fields:
            if f.name not in piece.columns:
                piece = piece.withColumn(f.name, F.lit(None).cast(f.dataType))
        piece = piece.select(*[F.col(f.name) for f in schema.fields])
        parts_df = piece if parts_df is None else parts_df.unionByName(piece)
    return parts_df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def versioned_change_feed(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    *,
    from_version: int,
    to_version: int,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC change feed between two table versions (the lakehouse
    ``table_changes`` surface): every key classified insert / update /
    delete with ``<col>_before`` / ``<col>_after`` payloads.

    The manifests make this cheap: partitions whose entry points at the
    SAME immutable directory in both versions cannot differ and are
    never read — the diff's cost tracks the partitions the intervening
    merges touched, not the table. The changed slices then diff with
    ``operators.merge.snapshot_diff`` (one key-shuffled full outer
    join)."""
    m_from = _read_manifest(spark, path, from_version)
    m_to = _read_manifest(spark, path, to_version)
    if m_from["partition_by"] != m_to["partition_by"]:
        raise VersionedTableError("partition_by changed between versions")
    # Diff under the UNION of both versions' schemas, not the FROM
    # schema: after add-only evolution the TO version is wider, and
    # pinning the FROM schema would (a) silently drop evolved columns
    # from insert/update payloads and (b) classify an update that only
    # changes an evolved column as unchanged. Pre-evolution files read
    # the evolved columns as typed nulls (r3 advisor finding).
    s_from = StructType.fromJson(json.loads(m_from["schema"]))
    s_to = StructType.fromJson(json.loads(m_to["schema"]))
    from_names = {f.name for f in s_from.fields}
    schema = StructType(
        list(s_from.fields) + [f for f in s_to.fields if f.name not in from_names]
    )
    part_cols = list(m_from["partition_by"])

    def emap(m: dict) -> dict[str, dict]:
        return {json.dumps(e["partition"], sort_keys=True): e for e in m["entries"]}

    fm, tm = emap(m_from), emap(m_to)
    changed = [
        k
        for k in sorted(set(fm) | set(tm))
        if (fm.get(k) or {}).get("dir") != (tm.get(k) or {}).get("dir")
    ]
    before = _read_entries(
        spark, path, [fm[k] for k in changed if k in fm], schema, part_cols
    )
    after = _read_entries(
        spark, path, [tm[k] for k in changed if k in tm], schema, part_cols
    )
    from ..operators.merge import snapshot_diff

    return snapshot_diff(before, after, list(keys), compare_cols=compare_cols)


def merge_versioned_table(
    spark: SparkSession,
    path: str,
    changes: DataFrame | Callable[[DataFrame], DataFrame],
    keys: Sequence[str],
    partition_by: Sequence[str],
    *,
    delete_col: str | None = None,
    max_retries: int = 3,
    txn: tuple[str, int] | None = None,
    allow_schema_evolution: bool = False,
) -> list[dict]:
    """MERGE ``changes`` into the table as a new atomic version; returns
    the rewritten partition-value dicts.

    Copy-on-write at partition granularity against an immutable
    snapshot: untouched partitions keep their existing manifest
    entries (zero IO), touched partitions re-point to freshly written
    files. Publication is one manifest rename — all-or-nothing across
    every touched partition. On a concurrency loss the merge recomputes
    against the new latest version (optimistic retry); the orphaned
    attempt dir stays invisible until vacuum.

    ``allow_schema_evolution=True`` admits NEW columns carried by the
    change batch (add-only evolution): existing rows read them as
    typed nulls, the published manifest pins the WIDER schema, and
    historical versions keep theirs — a time-travel read of version
    N uses version N's schema. Without the flag, unknown change
    columns are ignored (the pre-evolution behavior).

    ``txn=(app_id, epoch)`` makes the merge TRANSACTIONALLY idempotent
    (the Delta ``txn`` pattern): each manifest records the highest
    epoch applied per app_id, and a merge whose epoch is <= the
    recorded one is skipped entirely — because the check and the
    version swap are the same atomic rename, a crashed-and-replayed
    writer (e.g. a streaming foreachBatch epoch) can never
    double-apply, even under concurrent writers.

    ``changes`` may also be a CALLABLE ``snapshot -> DataFrame``: it is
    invoked INSIDE the retry loop with the attempt's fresh snapshot, so
    read-modify-write patterns (e.g. add this delta to stored counts)
    recompute against the post-race state instead of committing values
    derived from a stale read — the lost-update fix for writers that
    must read the table to build their change batch (r4 advice on
    ``cms_batch_writer``). A plain DataFrame keeps the existing
    semantics (changes independent of table state).
    """
    partition_by = list(partition_by)
    if delete_col is not None and delete_col in partition_by:
        raise VersionedTableError("delete_col cannot be a partition column")
    last_err: str = ""
    for _ in range(max_retries):
        v = latest_version(spark, path)
        manifest = _read_manifest(spark, path, v)
        if txn is not None:
            app_id, epoch = txn
            if manifest.get("txns", {}).get(app_id, -1) >= epoch:
                return []  # this epoch already committed — replay is a no-op
        if manifest["partition_by"] != partition_by:
            raise VersionedTableError(
                f"partition_by mismatch: table has {manifest['partition_by']}"
            )
        snapshot = read_versioned_table(spark, path, version=v)
        chg = changes(snapshot) if callable(changes) else changes
        schema_json = manifest["schema"]
        if allow_schema_evolution:
            known = set(snapshot.columns) | ({delete_col} if delete_col else set())
            new_cols = [c for c in chg.columns if c not in known]
            if set(new_cols) & set(partition_by):
                raise VersionedTableError("cannot evolve a partition column")
            for c in new_cols:
                snapshot = snapshot.withColumn(
                    c, F.lit(None).cast(chg.schema[c].dataType)
                )
            if new_cols:
                schema_json = snapshot.schema.json()

        batch_parts = [
            r.asDict() for r in chg.select(*partition_by).distinct().collect()
        ]
        # No explicit broadcast hint on the change-key set: a large CDC
        # batch's distinct keys can exceed driver/executor memory, and
        # AQE already promotes the build side to broadcast when its
        # runtime size is under the threshold — the hint would force it
        # unconditionally (r3 advisor finding). The left-semi stays a
        # shuffled hash join for big batches, which is the safe shape.
        key_set = chg.select(*list(keys)).distinct()
        old_parts = [
            r.asDict()
            for r in snapshot.join(key_set, on=list(keys), how="leftsemi")
            .select(*partition_by)
            .distinct()
            .collect()
        ]
        touched: list[dict] = []
        for p in batch_parts + old_parts:
            if p not in touched:
                touched.append(p)
        _check_partition_values(touched)
        if not touched:
            return []

        clause = None
        for p in touched:
            term = None
            for c in partition_by:
                eq = F.col(c).eqNullSafe(F.lit(p[c]))
                term = eq if term is None else term & eq
            clause = term if clause is None else clause | term
        merged = merge_upsert(
            snapshot.where(clause), chg, list(keys), delete_col=delete_col
        ).localCheckpoint(eager=True)

        new_entries = [
            e for e in manifest["entries"] if e["partition"] not in touched
        ]
        bloom_cols = list(manifest.get("bloom_cols", []))
        if merged.isEmpty():
            result_entries: list[dict] = []
        else:
            _, result_entries = _commit_data(merged, path, partition_by, bloom_cols)
        txns = dict(manifest.get("txns", {}))
        if txn is not None:
            txns[txn[0]] = txn[1]
        candidate = {
            "version": v + 1,
            "ts": time.time(),
            "schema": schema_json,
            "partition_by": partition_by,
            "entries": new_entries + result_entries,
            "txns": txns,
            "bloom_cols": bloom_cols,
        }
        if _write_manifest(spark, path, candidate):
            return touched
        last_err = f"lost commit race for version {v + 1}"
    raise VersionedTableError(f"merge failed after {max_retries} attempts: {last_err}")


def _zorder_column(df: DataFrame, cols: Sequence[str], *, bits: int = 4):
    """Z-value over rank-bucketed columns: each column maps to a
    ``2^bits``-bucket id via approxQuantile boundaries (driver-side
    model, robust to skew where min/max-based quantization — the
    ``sinks.layout.write_zordered`` variant — would collapse under
    outliers), then the ids interleave with the shared
    :func:`..sinks.layout.morton_interleave` so a range on ANY column
    maps to few contiguous z-runs. Nulls bucket to 0 (they cluster at
    the low end)."""
    from .layout import morton_interleave

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    sources = {}
    for c in cols:
        dt = dict(df.dtypes)[c]
        if not (
            dt in ("tinyint", "smallint", "int", "bigint", "float", "double", "date")
            or dt.startswith("timestamp")
            or dt.startswith("decimal")
        ):
            raise VersionedTableError(
                f"zorder_by supports numeric/date/timestamp columns; {c} is {dt}"
            )
        src = F.col(c)
        if dt == "date":
            src = F.unix_date(src).cast("double")
        elif dt.startswith("timestamp"):
            src = F.unix_micros(src).cast("double")
        sources[c] = src
    # ONE multi-column quantile pass (one job), not one per column
    qcols = [f"__zq_{c}" for c in cols]
    qdf = df.select(*[sources[c].alias(q) for c, q in zip(cols, qcols)])
    all_bounds = qdf.approxQuantile(qcols, probs, 0.01)
    def bucket_of(src, bounds):
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.aggregate(
            barr, F.lit(0), lambda acc, x: acc + F.when(src > x, 1).otherwise(0)
        )

    buckets = [bucket_of(sources[c], bounds) for c, bounds in zip(cols, all_bounds)]
    return morton_interleave(buckets, bits=bits)


def compact_versioned_table(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_partition: int = 1,
    max_retries: int = 3,
    zorder_by: Sequence[str] | None = None,
) -> list[dict]:
    """OPTIMIZE: rewrite fragmented partitions into few large files and
    publish the repointed manifest as a new version. Returns the
    partition-value dicts that were compacted (empty = nothing to do,
    no version written).

    Small files accumulate from parallel writes (every write task emits
    one file per partition value it holds) and kill scan throughput on
    object stores (per-file open cost, tiny row groups). Compaction is
    just another commit here: read ONLY the fragmented partitions,
    cluster by the partition columns so each lands in one task, write
    a fresh immutable commit dir, and swap the manifest — readers never
    see a half-compacted table, time travel still serves the old
    layout, and vacuum reclaims it later. Data content is unchanged,
    so a concurrent merge losing the race against a compaction (or
    vice versa) simply retries against the new manifest."""
    last_err = ""
    for _ in range(max_retries):
        v = latest_version(spark, path)
        m = _read_manifest(spark, path, v)
        schema = StructType.fromJson(json.loads(m["schema"]))
        part_cols = list(m["partition_by"])
        jvm, fs = _jfs(spark, path)
        fragmented = []
        for e in m["entries"]:
            d = jvm.org.apache.hadoop.fs.Path(f"{path}/{e['dir']}")
            n_files = sum(
                1
                for st in fs.listStatus(d)
                if st.getPath().getName().endswith(".parquet")
            )
            if n_files > max_files_per_partition:
                fragmented.append(e)
        if not fragmented:
            return []
        slice_df = _read_entries(spark, path, fragmented, schema, part_cols)
        # Repartitioning by part_cols alone hashes each partition VALUE
        # to a single task — always one output file per dir, making the
        # knob a pure selection threshold (r3 advisor finding). A
        # deterministic row-content salt in [0, max_files) spreads each
        # partition value over up to max_files_per_partition tasks, so
        # the output layout honors the knob (and a hot partition's
        # rewrite parallelizes instead of serializing in one task).
        n_tasks = max(len(fragmented) * max_files_per_partition, 1)
        if zorder_by:
            unknown = [c for c in zorder_by if c not in slice_df.columns]
            if unknown:
                raise VersionedTableError(f"zorder_by columns not in table: {unknown}")
            if set(zorder_by) & set(part_cols):
                raise VersionedTableError("zorder_by cannot include partition columns")
            # Z-ORDER clustering: range-partition + sort on the Morton
            # z-value so each output file covers a narrow rectangle in
            # zorder_by-space — per-file zone maps become tight on ALL
            # the z columns at once, which is what makes
            # range_filter skipping effective on more than one column.
            z = _zorder_column(slice_df, list(zorder_by))
            clustered = (
                slice_df.withColumn("__z", z)
                .repartitionByRange(n_tasks, *part_cols, "__z")
                .sortWithinPartitions(*part_cols, "__z")
                .drop("__z")
            )
        else:
            # Plain compaction: a deterministic row-content salt in
            # [0, max_files) spreads each partition value over up to
            # max_files_per_partition tasks (repartitioning by
            # part_cols alone would always yield ONE file per dir —
            # r3 advisor finding — and serialize hot partitions).
            data_cols = [f.name for f in schema.fields if f.name not in part_cols]
            salt = (
                F.pmod(
                    F.hash(*[F.col(c) for c in data_cols]),
                    F.lit(max_files_per_partition),
                )
                if data_cols
                else F.lit(0)
            )
            clustered = (
                slice_df.withColumn("__salt", salt)
                .repartition(n_tasks, *part_cols, "__salt")
                .drop("__salt")
            )
        _, new_entries = _commit_data(
            clustered.localCheckpoint(eager=True), path, part_cols,
            list(m.get("bloom_cols", [])),
        )
        keep = [e for e in m["entries"] if e not in fragmented]
        candidate = {
            "version": v + 1,
            "ts": time.time(),
            "schema": m["schema"],
            "partition_by": part_cols,
            "entries": keep + new_entries,
            "txns": dict(m.get("txns", {})),
            "bloom_cols": list(m.get("bloom_cols", [])),
        }
        if _write_manifest(spark, path, candidate):
            return [e["partition"] for e in fragmented]
        last_err = f"lost commit race for version {v + 1}"
    raise VersionedTableError(f"compaction failed after {max_retries} attempts: {last_err}")


def coalesce_versioned_partitions(
    spark: SparkSession,
    path: str,
    *,
    col: str,
    into,
    max_retries: int = 3,
) -> list[dict]:
    """COALESCE HISTORY: fold every partition whose ``col`` value
    differs from ``into`` under ``col = into``, published as one new
    version; returns the absorbed partition-value dicts (empty =
    nothing to fold, no version written).

    OPTIMIZE bounds the FILE count per partition dir; nothing bounds
    the DIR count when the nightly merge appends a fresh partition
    value per night (the Lucene segment model the BM25 posting store
    uses: every night is a new ``seg``, so a year of operation is
    365 × term-bucket dirs and a pruned serve opens O(nights) files —
    the r13 segment-accumulation probe measures exactly this growth).
    Coalescing is the segment-merge half of that model: the
    accumulated segments rewrite into the base segment, dir count
    returns to O(residual partition values), and nightly merges
    continue on top with fresh ``col`` values.

    ``col`` must be an INGEST-PROVENANCE partition column: its value
    records WHEN a row arrived, never WHAT the row means, and serving
    must not read it (BM25 scoring sums tf across all segments; the
    coalesce probe asserts served scores bit-identical). Every other
    column is carried bit-identically. Upsert keys stay unique
    because merge keys are table-global row identity — a key lives in
    exactly one partition before and after the fold.

    Like compaction, this is just another commit: read only the
    folding partitions, rewrite them clustered one-file-per-dir, and
    swap the manifest atomically. Time travel still serves the
    pre-coalesce segment layout; vacuum reclaims it later; a
    concurrent merge losing the race retries against the new
    manifest.
    """
    last_err = ""
    for _ in range(max_retries):
        v = latest_version(spark, path)
        m = _read_manifest(spark, path, v)
        schema = StructType.fromJson(json.loads(m["schema"]))
        part_cols = list(m["partition_by"])
        if col not in part_cols:
            raise VersionedTableError(
                f"coalesce column {col!r} is not a partition column {part_cols}"
            )
        residual_cols = [c for c in part_cols if c != col]
        victims = [e for e in m["entries"] if e["partition"][col] != into]
        if not victims:
            return []
        # fold the existing `into` dirs that share a residual value with
        # a victim into the same rewrite, so each residual dir comes out
        # as ONE fresh file instead of old-file + folded-file
        touched = {
            tuple(e["partition"][c] for c in residual_cols) for e in victims
        }
        absorbers = [
            e
            for e in m["entries"]
            if e["partition"][col] == into
            and tuple(e["partition"][c] for c in residual_cols) in touched
        ]
        rewrite = victims + absorbers
        slice_df = _read_entries(spark, path, rewrite, schema, part_cols)
        into_typed = F.lit(into).cast(
            next(f.dataType for f in schema.fields if f.name == col)
        )
        # one residual partition value per task -> exactly one file per
        # post-fold dir (all rows of a value hash to one task)
        clustered = slice_df.withColumn(col, into_typed).repartition(
            max(len(touched), 1), *part_cols
        )
        _, new_entries = _commit_data(
            clustered.localCheckpoint(eager=True),
            path,
            part_cols,
            list(m.get("bloom_cols", [])),
        )
        keep = [e for e in m["entries"] if e not in rewrite]
        candidate = {
            "version": v + 1,
            "ts": time.time(),
            "schema": m["schema"],
            "partition_by": part_cols,
            "entries": keep + new_entries,
            "txns": dict(m.get("txns", {})),
            "bloom_cols": list(m.get("bloom_cols", [])),
        }
        if _write_manifest(spark, path, candidate):
            return [e["partition"] for e in victims]
        last_err = f"lost commit race for version {v + 1}"
    raise VersionedTableError(
        f"coalesce failed after {max_retries} attempts: {last_err}"
    )


def table_history(spark: SparkSession, path: str) -> list[dict]:
    """Version lineage: (version, commit wall-clock, partition count)."""
    out = []
    for v in list_versions(spark, path):
        m = _read_manifest(spark, path, v)
        out.append({"version": v, "ts": m["ts"], "n_partitions": len(m["entries"])})
    return out


def vacuum_versioned_table(
    spark: SparkSession, path: str, *, keep_last: int = 2, min_age_seconds: int = 3600
) -> list[str]:
    """Reclaim storage: keep the newest ``keep_last`` manifests, delete
    older manifests and every ``data/<commit>`` directory no retained
    manifest references (covers both superseded commits and orphaned
    dirs from lost merge races). Returns the deleted paths.

    ``min_age_seconds`` (default 1h) is the in-flight-writer guard: a
    commit dir younger than this may belong to a merge that has
    written its data but not yet published its manifest — deleting it
    would break the version that is about to appear. Pass ``0`` only
    when no writer can be running."""
    if keep_last < 1:
        raise VersionedTableError("keep_last must be >= 1")
    versions = list_versions(spark, path)
    # tagged versions are PINNED: their manifests and data survive any
    # keep_last window — a tag is a promise that snapshot stays readable
    tagged = set(list_tags(spark, path).values())
    retained = set(versions[-keep_last:]) | (tagged & set(versions))
    live_commits = set()
    for v in retained:
        for e in _read_manifest(spark, path, v)["entries"]:
            live_commits.add(e["dir"].split("/")[1])
    jvm, fs = _jfs(spark, path)
    deleted: list[str] = []
    cutoff_ms = (time.time() - min_age_seconds) * 1000.0
    data_root = jvm.org.apache.hadoop.fs.Path(f"{path}/{_DATA_DIR}")
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name not in live_commits
                and st.getModificationTime() <= cutoff_ms
            ):
                fs.delete(st.getPath(), True)
                deleted.append(st.getPath().toString())
    for v in versions:
        if v in retained:
            continue
        p = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, v))
        fs.delete(p, False)
        deleted.append(p.toString())
    return deleted
