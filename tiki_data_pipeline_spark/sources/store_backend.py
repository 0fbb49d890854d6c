"""Object-store-safe MANIFEST backend for persisted stores.

The repo's store layer (MinHash band stores, LSH/IVF/PQ embedding
indexes, bare parquet stores) ships two interchangeable physical
backends behind one API (`sources.files` dispatches per store):

- **posix** (default): the hardlink/rename machinery — snapshots are
  hardlink trees under ``_versions/``, rewrites are crash-safe
  whole-directory swaps. O(metadata) and exactly right on a real
  filesystem; meaningless on S3/GCS, which have no rename-as-commit
  and no hardlinks.
- **manifest** (this module): the lakehouse shape (Iceberg/Delta
  re-expressed on plain parquet + JSON). Data files are IMMUTABLE and
  live under numbered generation prefixes ``_g/<gen>/``; a manifest
  JSON lists the files of each generation; ``_mf/CURRENT.json`` is
  the single mutable pointer. Every mutation writes NEW files plus a
  NEW manifest and commits by atomically replacing the pointer —
  snapshot = pin a generation (one small JSON write, zero data I/O),
  rollback = point a new manifest at an old generation's file list,
  fold/compact = write replacement files and REFERENCE the untouched
  ones, expiry = manifest-diff garbage collection.

Everything here reduces to five object-store primitives — atomic
single-key put, get, list, delete, exists (:class:`LocalObjectFS`) —
plus Spark writing fresh parquet files into a fresh prefix. No
``os.rename`` of data, no ``os.link``, no in-place mutation above
that class: the greppable portability argument. On this sandbox the
primitives are backed by the local filesystem (``put_atomic`` models
an atomic PUT with a temp-file + ``os.replace`` of a SINGLE file,
which object stores give natively); pointing the class at an
``s3://`` client is the only porting work.

Concurrency contract: single writer, many readers — the same
maintenance-window discipline the posix swap path documents. A
reader that resolved CURRENT keeps a consistent generation for its
whole scan (manifests and data files are immutable); garbage
collection (:func:`gc_store`) runs in the writer's window, after the
pointer flip, exactly like the posix swap deleting its ``.old`` copy.

Version-pinned handles: ``<root>@v<N>`` addresses snapshot ``N`` of a
manifest store the way ``<root>/_versions/v<N>`` addresses a posix
snapshot — a complete read-only store (data + sidecars + meta as of
the pin) accepted by every read-side helper and serve function.
``sources.files.version_path`` renders the right handle per backend.

Reference analogue: point-in-time recovery and transactional DELETE
on the reference's OLTP store
(src/pipelines/crawl/storage/postgres_storage.py:250-356); at 100 TB
on immutable parquet the equivalent contract is manifest commits.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MF_DIR = "_mf"
GEN_DIR = "_g"
CURRENT = "CURRENT.json"
VERSIONS = "versions.json"

BACKEND_ENV = "SPARK_GRAFT_STORE_BACKEND"


def resolve_backend(explicit: str | None = None) -> str:
    """Which backend a NEW store should be born with: the explicit
    argument wins, else the ``SPARK_GRAFT_STORE_BACKEND`` environment
    default, else posix. EXISTING stores are self-describing
    (:func:`is_manifest_store`) — this only steers creation."""
    b = explicit or os.environ.get(BACKEND_ENV) or "posix"
    if b not in ("posix", "manifest"):
        raise ValueError(f"unknown store backend {b!r}")
    return b


class LocalObjectFS:
    """The five primitives an object store offers, backed locally.

    Manifest-mode code above this class may ONLY use these (plus
    Spark writing new parquet files into a fresh prefix): no rename
    of data, no hardlinks, no directory swaps. ``put_atomic`` is the
    one place a local rename appears — replacing a SINGLE small key,
    which is exactly the atomicity an object-store PUT provides."""

    def put_atomic(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)  # local model of an atomic object PUT

    def put_if_absent(self, path: str, text: str) -> bool:
        """Exclusive create — the CAS primitive real object stores
        offer (S3 ``If-None-Match: *``, GCS ``if-generation-match: 0``).
        Returns False when the key already exists."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(text)
        return True

    def get_text(self, path: str) -> str | None:
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return f.read()

    def list_files(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return sorted(
            os.path.join(dp, fn)
            for dp, _dns, fns in os.walk(prefix)
            for fn in fns
        )

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
        # local nicety only: object stores have no directories to prune.
        # Every key lives under the store's _g/ or _mf/ tree; pruning
        # STOPS after removing one of those roots — their parent is the
        # store root, and ascending further could rmdir directories
        # above the store (e.g. a temp parent holding only this store).
        d = os.path.dirname(path)
        while d and os.path.isdir(d) and not os.listdir(d):
            at_store_top = os.path.basename(d) in (GEN_DIR, MF_DIR)
            os.rmdir(d)
            if at_store_top:
                break
            d = os.path.dirname(d)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


FS = LocalObjectFS()


# ---------------------------------------------------------------------------
# Pinned-version handles
# ---------------------------------------------------------------------------

_PIN = "@v"


def split_pin(path: str) -> tuple[str, int | None]:
    """``root@vN`` → (root, N); plain paths → (path, None)."""
    if _PIN in path:
        root, _, tail = path.rpartition(_PIN)
        if tail.isdigit():
            return root, int(tail)
    return path, None


def is_manifest_store(path: str) -> bool:
    root, _ = split_pin(path)
    return FS.exists(os.path.join(root, MF_DIR, CURRENT))


# ---------------------------------------------------------------------------
# Manifests
# ---------------------------------------------------------------------------


def _mf(root: str, name: str) -> str:
    return os.path.join(root, MF_DIR, name)


def _gen_manifest_path(root: str, gen: int) -> str:
    return _mf(root, f"gen-{gen:08d}.json")


def current_gen(root: str) -> int:
    txt = FS.get_text(_mf(root, CURRENT))
    return int(json.loads(txt)["gen"]) if txt else 0


def read_manifest(root: str, gen: int) -> dict:
    if gen == 0:
        return {"gen": 0, "parent": 0, "op": "init", "files": []}
    txt = FS.get_text(_gen_manifest_path(root, gen))
    if txt is None:
        raise ValueError(f"manifest store {root} has no manifest gen {gen}")
    return json.loads(txt)


def _lp(rel: str) -> str:
    """Logical path of a physical relpath: strip the ``_g/<gen>/``
    prefix. The physical tree under each generation MIRRORS the
    logical store layout, so partition dirs (``band=0``) and sidecar
    names (``_fingerprints``) read straight off the logical path."""
    parts = rel.split("/", 2)
    if len(parts) == 3 and parts[0] == GEN_DIR:
        return parts[2]
    return rel


def _covered(lp: str, sub: str | None) -> bool:
    """Does a logical path belong to the requested scope? ``sub=None``
    = the DATA tree (every non-underscore logical entry)."""
    if sub is None:
        return not lp.split("/", 1)[0].startswith("_")
    return lp == sub or lp.startswith(sub + "/")


def manifest_files(
    root: str, sub: str | None = None, gen: int | None = None
) -> list[str]:
    """Relpaths (from the store root) of the files in scope at a
    generation (default: CURRENT)."""
    g = current_gen(root) if gen is None else gen
    m = read_manifest(root, g)
    return [f for f in m["files"] if _covered(_lp(f), sub)]


def _resolve_gen(root: str, pin: int | None) -> int:
    return current_gen(root) if pin is None else version_gen(root, pin)


# ---------------------------------------------------------------------------
# Read / write
# ---------------------------------------------------------------------------


def store_read(
    spark: SparkSession, path: str, sub: str | None = None
) -> DataFrame | None:
    """Manifest-resolved scan of the data tree (``sub=None``) or one
    sidecar. Files are grouped by generation and each group is read
    with ``basePath`` at its generation prefix, so Hive-style
    partition columns (``band=``/``bkt=``/``fpb=``…) parse exactly as
    a posix directory read — and Catalyst partition-prunes each
    group's in-memory file index, so ``isin`` probes still skip
    unqueried partitions. Returns None when the scope holds no files
    (the posix 'directory absent' contract)."""
    root, pin = split_pin(path)
    files = manifest_files(root, sub, _resolve_gen(root, pin))
    files = [f for f in files if f.endswith(".parquet")]
    if not files:
        return None
    by_gen: dict[str, list[str]] = {}
    for f in files:
        parts = f.split("/", 2)
        by_gen.setdefault("/".join(parts[:2]), []).append(f)
    out: DataFrame | None = None
    for gpref, fs in sorted(by_gen.items()):
        base = os.path.join(root, gpref, sub) if sub else os.path.join(root, gpref)
        df = spark.read.option("basePath", base).parquet(
            *[os.path.join(root, f) for f in fs]
        )
        out = df if out is None else out.unionByName(df)
    return out


def store_sub_exists(path: str, sub: str) -> bool:
    root, pin = split_pin(path)
    return bool(manifest_files(root, sub, _resolve_gen(root, pin)))


def _list_new_parquet(root: str, target: str) -> list[str]:
    return [
        os.path.relpath(f, root)
        for f in FS.list_files(target)
        if f.endswith(".parquet")
    ]


class ConcurrentCommitError(RuntimeError):
    """The single-writer contract was violated: another writer
    committed a generation between this mutation's base read and its
    commit. The losing mutation's files are orphans the next
    :func:`gc_store` sweeps; re-run the mutation against the new
    CURRENT."""


def _commit(
    root: str,
    files: list[str],
    op: str,
    parent: int | None = None,
    based_on: int | None = None,
) -> int:
    """Write the next generation's manifest and flip CURRENT — THE
    commit point of every manifest-store mutation. A crash before the
    flip leaves an orphan manifest/generation that the next
    :func:`gc_store` sweeps; the flip itself is one atomic put.

    Contract guard: ``based_on`` is the generation the mutation READ
    as its parent. The commit refuses (raises
    :class:`ConcurrentCommitError`) if CURRENT has moved since — and
    the generation manifest itself is claimed with an exclusive
    create, so two racing committers that both pass the check cannot
    both land (the object-store CAS; last-write-wins would silently
    drop the loser's generation)."""
    cur = current_gen(root)
    if based_on is not None and cur != based_on:
        raise ConcurrentCommitError(
            f"store {root}: CURRENT moved from gen {based_on} to {cur} "
            f"during this mutation ({op}) — concurrent writer detected; "
            "re-run against the new CURRENT"
        )
    gen = cur + 1
    manifest = {
        "gen": gen,
        "parent": cur if parent is None else parent,
        "op": op,
        "created_unix": int(time.time()),
        "files": sorted(set(files)),
    }
    if not FS.put_if_absent(_gen_manifest_path(root, gen), json.dumps(manifest)):
        # The claim key exists. Two possibilities: (a) a live racing
        # writer that claimed first (its CURRENT flip lands any moment),
        # (b) the orphan of a commit that crashed between its claim and
        # its flip. An orphan gen > CURRENT is by definition
        # unreferenced, so (b) is recoverable in-line — previously it
        # wedged every subsequent commit until a manual gc_store().
        _sweep_claim_orphan_or_raise(root, cur, gen, op)
        if not FS.put_if_absent(
            _gen_manifest_path(root, gen), json.dumps(manifest)
        ):
            raise ConcurrentCommitError(
                f"store {root}: generation {gen} was re-claimed while "
                f"recovering a crash orphan (racing {op}) — concurrent "
                "writer detected; re-run against the new CURRENT"
            )
    FS.put_atomic(_mf(root, CURRENT), json.dumps({"gen": gen}))
    return gen


def _orphan_grace_secs() -> float:
    """How old an unreferenced claim must be before a committer may
    sweep it as a crash orphan. Below this age it is treated as a LIVE
    racing writer inside its claim→flip window and the commit raises
    instead (the CAS contract). Env-tunable for tests and for
    restart-fast streaming deployments."""
    return float(os.environ.get("SPARK_GRAFT_ORPHAN_GRACE_SECS", "30"))


def _sweep_claim_orphan_or_raise(
    root: str, based_gen: int, gen: int, op: str
) -> None:
    """Recover from a crashed commit's orphan claim at ``gen``, or
    raise :class:`ConcurrentCommitError` when the existing claim
    belongs to a live concurrent writer.

    Decision: if CURRENT has moved past ``based_gen``, a racing writer
    committed — true race, raise. If CURRENT is unmoved, the manifest
    at ``gen`` is unreferenced; a claim older than the grace window is
    a crash orphan (no writer sits in its claim→flip window for 30 s)
    and is swept so the caller can retry the claim once. Its data
    files stay orphans for the next :func:`gc_store`. A younger claim
    is presumed to be a live writer about to flip — raise, keeping the
    CAS guarantee for genuine races."""
    if current_gen(root) != based_gen:
        raise ConcurrentCommitError(
            f"store {root}: CURRENT moved from gen {based_gen} during "
            f"this mutation ({op}) — concurrent writer committed first; "
            "re-run against the new CURRENT"
        )
    txt = FS.get_text(_gen_manifest_path(root, gen))
    created = 0
    if txt is not None:
        try:
            created = int(json.loads(txt).get("created_unix", 0))
        except (ValueError, KeyError, json.JSONDecodeError):
            created = 0  # unreadable claim: treat as ancient, sweep it
    age = time.time() - created
    if age < _orphan_grace_secs():
        raise ConcurrentCommitError(
            f"store {root}: a manifest for generation {gen} was claimed "
            f"{age:.1f}s ago and CURRENT has not flipped (racing {op}) — "
            "presumed live concurrent writer; re-run against the new "
            "CURRENT once it lands"
        )
    FS.delete(_gen_manifest_path(root, gen))


def store_put(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: str | None = None,
    sub: str | None = None,
    coalesce: int | None = None,
    range_key: str | None = None,
    n_range_files: int | None = None,
    keep_sidecars: bool = False,
    files_per_partition: int | None = None,
) -> int:
    """Write a batch into a manifest store: new parquet files under a
    fresh generation prefix, then one manifest commit. ``mode``
    applies to the MANIFEST, never to files — 'append' keeps the
    parent generation's references, 'overwrite' drops those in scope
    (``sub``, or the whole data tree) — so the physical write below
    is always into an empty prefix. Shapes mirror the posix writers
    1:1 (partitioned / range-sorted flat / coalesced sidecar), so
    plans and row-group layouts are identical across backends.
    ``files_per_partition`` > 1 salts the partitioned repartition so
    each Hive dir comes out with up to that many files (the posix
    ``compact_store`` honors its target the same way)."""
    root, pin = split_pin(path)
    if pin is not None:
        raise ValueError(f"cannot write to a pinned snapshot handle {path}")
    cur = current_gen(root)
    gen_dir = os.path.join(root, GEN_DIR, f"{cur + 1:08d}")
    target = os.path.join(gen_dir, sub) if sub else gen_dir
    w = df
    if partition_by is not None:
        if files_per_partition and files_per_partition > 1:
            # exactly N tasks, rows row-hash-spread across them: each
            # task writes one file per key it holds → up to N files
            # per Hive dir (the posix compact_parquet target honored)
            w = w.repartition(
                files_per_partition, F.xxhash64(*[F.col(c) for c in df.columns])
            )
        else:
            # one task per key: each Hive dir comes out as one file
            w = w.repartition(F.col(partition_by))
        (
            w.write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(target)
        )
    elif range_key is not None:
        n = n_range_files or 4
        (
            w.repartitionByRange(n, range_key)
            .sortWithinPartitions(range_key)
            .write.mode("overwrite")
            .parquet(target)
        )
    else:
        if coalesce:
            w = w.coalesce(coalesce)
        w.write.mode("overwrite").parquet(target)
    new_files = _list_new_parquet(root, target)
    parent_files = read_manifest(root, cur)["files"]
    if mode == "append":
        keep = parent_files
    elif sub is None and not keep_sidecars:
        # full-data overwrite = full rebuild: drop EVERY reference,
        # sidecars included — posix parity (Spark's overwrite clears
        # the whole tree there). A rebuilt store that silently kept
        # its old _tombstones would hide ids the new corpus contains.
        keep = []
    elif sub is None:
        # keep_sidecars=True: an INTERNAL data-only rewrite (compact /
        # layout migration) — replace the data tree, carry every
        # sidecar + meta reference, exactly like the posix staged
        # swaps that copy sidecars into staging verbatim
        keep = [f for f in parent_files if _lp(f).split("/", 1)[0].startswith("_")]
    else:
        keep = [f for f in parent_files if not _covered(_lp(f), sub)]
    return _commit(root, keep + new_files, f"{mode}:{sub or 'data'}", based_on=cur)


def put_json_entry(root: str, name: str, payload: dict) -> int:
    """Version a small JSON artifact (``_meta.json``) as a manifest
    entry: the file lands in a fresh generation and replaces the
    previous logical entry, so snapshots pin the meta AS OF the pin —
    a time-travel serve resolves the plane count / build parameters
    that store actually had."""
    cur = current_gen(root)
    gen_dir = os.path.join(root, GEN_DIR, f"{cur + 1:08d}")
    FS.put_atomic(os.path.join(gen_dir, name), json.dumps(payload))
    parent_files = read_manifest(root, cur)["files"]
    keep = [f for f in parent_files if _lp(f) != name]
    rel = os.path.relpath(os.path.join(gen_dir, name), root)
    return _commit(root, keep + [rel], f"meta:{name}", based_on=cur)


def get_json_entry(path: str, name: str) -> dict | None:
    root, pin = split_pin(path)
    if not is_manifest_store(root):
        return None
    m = read_manifest(root, _resolve_gen(root, pin))
    hits = [f for f in m["files"] if _lp(f) == name]
    if not hits:
        return None
    txt = FS.get_text(os.path.join(root, hits[0]))
    return json.loads(txt) if txt else None


# ---------------------------------------------------------------------------
# Versions: snapshot / rollback / expiry / GC
# ---------------------------------------------------------------------------


def _versions_doc(root: str) -> dict:
    txt = FS.get_text(_mf(root, VERSIONS))
    return json.loads(txt) if txt else {"next": 1, "versions": []}


def list_versions(root: str) -> list[dict]:
    return sorted(_versions_doc(root)["versions"], key=lambda m: m["version"])


def version_gen(root: str, version: int) -> int:
    for v in _versions_doc(root)["versions"]:
        if v["version"] == version:
            return int(v["gen"])
    known = [v["version"] for v in list_versions(root)]
    raise ValueError(
        f"store {root} has no snapshot v{version}; recorded: {known}"
    )


def snapshot(root: str, tag: str | None = None) -> int:
    """Pin the CURRENT generation as a named version: one small JSON
    write, no per-file work at all — strictly cheaper than the posix
    hardlink tree, and the honest 100 TB cost model (a snapshot of a
    petabyte store is a metadata row). The pinned generation's files
    are GC-protected until the version is expired."""
    doc = _versions_doc(root)
    v = int(doc["next"])
    entries = sorted(
        {_lp(f).split("/", 1)[0] for f in read_manifest(root, current_gen(root))["files"]}
    )
    doc["versions"].append(
        {
            "version": v,
            "gen": current_gen(root),
            "tag": tag,
            "created_unix": int(time.time()),
            "entries": entries,
        }
    )
    doc["next"] = v + 1
    FS.put_atomic(_mf(root, VERSIONS), json.dumps(doc))
    return v


def rollback(root: str, version: int) -> None:
    """Restore the live store to a snapshot: a NEW manifest whose file
    list IS the pinned generation's — zero data movement, one commit.
    History survives (including newer snapshots): a rollback is an
    event, not history rewriting; roll forward again if the rollback
    itself was the mistake."""
    gen = version_gen(root, version)
    _commit(root, read_manifest(root, gen)["files"], f"rollback:v{version}")


def expire_versions(
    root: str,
    keep_last: int | None = None,
    before: int | None = None,
    keep_tags: tuple[str, ...] | bool = (),
) -> list[int]:
    """Drop old snapshots and garbage-collect: manifest-diff GC — a
    data file is deleted exactly when no retained version and not the
    live generation references it. ``keep_tags`` pins snapshots
    against every rule (tuple of tags, or True = every tagged one).
    The versions-doc put is the commit point; a crash mid-GC leaves
    unreferenced files the next GC call sweeps (GC is idempotent)."""
    from tiki_data_pipeline_spark.sources.files import _pinned_versions

    doc = _versions_doc(root)
    versions = sorted(v["version"] for v in doc["versions"])
    victims: set[int] = set()
    if before is not None:
        victims |= {v for v in versions if v < before}
    if keep_last is not None:
        victims |= set(versions[: max(len(versions) - keep_last, 0)])
    victims -= _pinned_versions(doc["versions"], keep_tags)
    if victims:
        doc["versions"] = [
            v for v in doc["versions"] if v["version"] not in victims
        ]
        FS.put_atomic(_mf(root, VERSIONS), json.dumps(doc))
        gc_store(root)
    return sorted(victims)


def gc_store(root: str) -> dict:
    """Delete every physical file no retained generation references.
    Retained = the CURRENT generation + every snapshot-pinned one.
    Also drops unretained generation manifests (their file lists are
    dead) — but never CURRENT's chain-of-record. Idempotent; run in
    the writer's maintenance window (same discipline as the posix
    swap deleting its ``.old`` copy)."""
    live_gens = {current_gen(root)} | {
        int(v["gen"]) for v in _versions_doc(root)["versions"]
    }
    live_files: set[str] = set()
    for g in live_gens:
        if g > 0:
            live_files |= set(read_manifest(root, g)["files"])
    removed_data = 0
    gdir = os.path.join(root, GEN_DIR)
    for f in FS.list_files(gdir):
        rel = os.path.relpath(f, root)
        if rel not in live_files:
            FS.delete(f)
            removed_data += 1
    removed_manifests = 0
    for f in FS.list_files(os.path.join(root, MF_DIR)):
        name = os.path.basename(f)
        if name.startswith("gen-") and name.endswith(".json"):
            g = int(name[4:-5])
            if g not in live_gens:
                FS.delete(f)
                removed_manifests += 1
    return {"files_deleted": removed_data, "manifests_deleted": removed_manifests}


# ---------------------------------------------------------------------------
# Layout inspection
# ---------------------------------------------------------------------------


def data_partition_key(path: str) -> str | None:
    """The Hive partition key of the data tree (``band``/``bkt``/
    ``cid``…) read off the manifest's logical paths, or None for a
    flat layout."""
    root, pin = split_pin(path)
    for f in manifest_files(root, None, _resolve_gen(root, pin)):
        seg = _lp(f).split("/", 1)[0]
        if "=" in seg:
            return seg.split("=", 1)[0]
    return None


def data_partition_dirs(path: str) -> set[str]:
    """Logical partition-dir names (``band=0`` …) of the data tree."""
    root, pin = split_pin(path)
    out = set()
    for f in manifest_files(root, None, _resolve_gen(root, pin)):
        seg = _lp(f).split("/", 1)[0]
        if "=" in seg:
            out.add(seg)
    return out


def store_layout(path: str) -> tuple[str | None, bool]:
    """Manifest twin of ``files.store_layout``: (key, partitioned)
    from the manifest's logical paths, falling back to the first data
    file's schema for flat key-sorted layouts."""
    key = data_partition_key(path)
    if key in ("band", "bkt", "cid"):
        return key, True
    root, pin = split_pin(path)
    files = [
        f
        for f in manifest_files(root, None, _resolve_gen(root, pin))
        if f.endswith(".parquet")
    ]
    if files:
        try:
            import pyarrow.parquet as pq

            cols = set(pq.read_schema(os.path.join(root, files[0])).names)
            for k in ("band", "bkt", "cid"):
                if k in cols:
                    return k, False
        except Exception:
            pass
    return None, False


# ---------------------------------------------------------------------------
# Maintenance: fold / compact / migrate
# ---------------------------------------------------------------------------


def _scrub_decisions_manifest(
    spark: SparkSession,
    root: str,
    gen_dir: str,
    refs: list[str],
    tomb: DataFrame,
) -> tuple[list[str], list[str]]:
    """Manifest twin of ``files._fold_decisions_sidecar``: retire
    tombstoned ids from the streaming sinks' ``_decisions`` lineage
    log. Leaf-pruned — one column-pruned scan tagged with
    ``input_file_name`` finds the ``run=/epoch=`` leaves that actually
    reference a victim (as subject id or ``matched_id`` pointer); only
    those are rewritten as NEW files under the fold's generation,
    every untouched leaf's references carry verbatim (zero data I/O).
    Subject rows DROP, ``matched_id`` pointers NULL — same GDPR
    contract as the posix scrub. Returns (kept refs, new refs)."""
    leaves: dict[str, list[str]] = {}
    for f in refs:
        leaves.setdefault(os.path.dirname(_lp(f)), []).append(f)
    df = store_read(spark, root, "_decisions")
    idc = (
        next((c for c in ("doc_id", "vec_id", "id") if c in df.columns), None)
        if df is not None
        else None
    )
    ref_cols = [
        c
        for c in (idc, "matched_id")
        if c and c in (df.columns if df is not None else [])
    ]
    if not ref_cols:
        return refs, []

    from urllib.parse import unquote, urlparse

    hits = (
        df.select(
            F.input_file_name().alias("_f"),
            F.explode(F.array(*[F.col(c) for c in ref_cols])).alias("id"),
        )
        .join(F.broadcast(tomb), "id", "semi")
        .select("_f")
        .distinct()
        .collect()
    )
    affected: set[str] = set()
    for r in hits:
        p = r["_f"]
        if p.startswith("file:"):
            p = unquote(urlparse(p).path)
        affected.add(os.path.dirname(_lp(os.path.relpath(p, root))))

    keep: list[str] = []
    new_files: list[str] = []
    for leaf, leaf_refs in sorted(leaves.items()):
        if leaf not in affected:
            keep += leaf_refs
            continue
        # leaf read (explicit files, inferred basePath = the leaf dir):
        # no partition columns, matching the posix leaf-file read
        ldf = spark.read.parquet(*[os.path.join(root, f) for f in leaf_refs])
        out = ldf
        if idc in ldf.columns:
            out = out.join(
                F.broadcast(tomb.withColumnRenamed("id", idc)), idc, "anti"
            )
        if "matched_id" in ldf.columns:
            vt = tomb.select(
                F.col("id").alias("matched_id"), F.lit(True).alias("_v")
            )
            out = (
                out.join(F.broadcast(vt), "matched_id", "left")
                .withColumn(
                    "matched_id",
                    F.when(F.col("_v").isNull(), F.col("matched_id")),
                )
                .drop("_v")
            )
        target = os.path.join(gen_dir, leaf)
        # coalesce(1): an emptied epoch leaf still holds one
        # schema-bearing file for later reads of the log
        out.select(*ldf.columns).coalesce(1).write.mode("overwrite").parquet(
            target
        )
        new_files += _list_new_parquet(root, target)
    return keep, new_files


def fold_tombstones_manifest(
    spark: SparkSession,
    path: str,
    fold_sidecars: tuple[str, ...] = ("_fingerprints",),
    prune: bool | str = "auto",
    refresh_hot: bool = True,
) -> int:
    """Manifest twin of ``files.fold_tombstones`` — same pruning
    logic, object-store-safe mechanics: victim partitions are
    rewritten as NEW files under a fresh generation, untouched
    partitions are carried BY REFERENCE (their manifest entries copy
    verbatim — zero data I/O, the manifest equivalent of the posix
    hardlink carry), the ``_tombstones`` entries are simply not
    listed, and ONE pointer put commits everything. Old files are
    garbage-collected after the commit unless a snapshot pins them
    (time travel to a pre-fold version intentionally still sees the
    folded rows). ``prune`` semantics match the posix path: "auto"
    prunes on bkt/cid trees (never band — every band partition holds
    every victim by construction), True forces it, False forces the
    full rewrite."""
    from tiki_data_pipeline_spark.sources import files as FL

    root, pin = split_pin(path)
    if pin is not None:
        raise ValueError(f"cannot fold a pinned snapshot handle {path}")
    if os.path.isdir(os.path.join(root, "_decisions")):
        # a physical _decisions dir the manifest never listed (written
        # by a pre-dispatch streaming path): folding would succeed
        # WITHOUT scrubbing it — a silent takedown-lineage leak
        raise ValueError(
            f"manifest store {root} carries a rogue physical _decisions "
            "directory outside the manifest; migrate it into manifest "
            "entries (re-run the stream on the fixed sink, or commit the "
            "files) before folding tombstones"
        )
    tomb_raw = store_read(spark, root, FL.TOMBSTONE_DIR)
    if tomb_raw is None:
        return 0
    tomb = tomb_raw.select("id").distinct()
    n_tomb = tomb.count()
    key = data_partition_key(root)
    part_key = key if key in ("band", "bkt", "cid") else None
    scan = store_read(spark, root, None)
    if scan is None:
        scan = tomb.limit(0)

    affected_vals: list | None = None
    removed_rows: int | None = None
    do_prune = prune is True or (prune == "auto" and part_key != "band")
    actual = data_partition_dirs(root)
    if part_key is not None and do_prune:
        aff = (
            scan.join(F.broadcast(tomb), "id", "semi")
            .groupBy(part_key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        vals = [r[part_key] for r in aff]
        expected = {f"{part_key}={v}" for v in vals}
        # same aliased-dir 1:1 guard as the posix fold: names must
        # round-trip to distinct parsed values or pruning is unprovable
        if (
            all(v is not None for v in vals)
            and expected <= actual
            and len(actual) == scan.select(part_key).distinct().count()
        ):
            affected_vals = vals
            removed_rows = sum(r["_n"] for r in aff)

    cur = current_gen(root)
    gen_dir = os.path.join(root, GEN_DIR, f"{cur + 1:08d}")
    parent_files = read_manifest(root, cur)["files"]
    keep: list[str] = []
    new_files: list[str] = []

    # ---- data tree ----
    if part_key is not None and affected_vals is not None:
        untouched = actual - {f"{part_key}={v}" for v in affected_vals}
        keep += [
            f
            for f in parent_files
            if _lp(f).split("/", 1)[0] in untouched
        ]
        if affected_vals:
            live = scan.filter(F.col(part_key).isin(affected_vals)).join(
                F.broadcast(tomb), "id", "anti"
            )
            (
                live.repartition(F.col(part_key))
                .write.mode("overwrite")
                .partitionBy(part_key)
                .parquet(gen_dir)
            )
            new_files += _list_new_parquet(root, gen_dir)
    elif part_key is not None:
        live = scan.join(F.broadcast(tomb), "id", "anti")
        (
            live.repartition(F.col(part_key))
            .write.mode("overwrite")
            .partitionBy(part_key)
            .parquet(gen_dir)
        )
        new_files += _list_new_parquet(root, gen_dir)
    else:
        live = scan.join(F.broadcast(tomb), "id", "anti")
        sort_key = next(
            (k for k in ("band", "bkt", "cid") if k in live.columns), None
        )
        if sort_key is not None:
            live = live.repartitionByRange(4, sort_key).sortWithinPartitions(
                sort_key
            )
        live.write.mode("overwrite").parquet(gen_dir)
        new_files += _list_new_parquet(root, gen_dir)
    if not keep and not new_files:
        # every row deleted: keep one schema-bearing file for later reads
        scan.limit(0).coalesce(1).write.mode("overwrite").parquet(gen_dir)
        new_files += _list_new_parquet(root, gen_dir)

    # ---- sidecars ----
    tops = {
        _lp(f).split("/", 1)[0]
        for f in parent_files
        if _lp(f).split("/", 1)[0].startswith("_")
    }
    for name in sorted(tops):
        if name == FL.TOMBSTONE_DIR:
            continue  # folded: simply not listed — atomic with the commit
        refs = [f for f in parent_files if _covered(_lp(f), name)]
        if name == "_decisions":
            # lineage records must stop naming retired ids too
            k, nf = _scrub_decisions_manifest(spark, root, gen_dir, refs, tomb)
            keep += k
            new_files += nf
            continue
        if name in fold_sidecars and refs:
            bucketed = any(
                _lp(f).startswith(f"{name}/fpb=") for f in refs
            )
            src = store_read(spark, root, name)
            tgt = os.path.join(gen_dir, name)
            if bucketed:
                affected_b = sorted(
                    r["b"]
                    for r in tomb.select(
                        FL.fp_bucket(F.col("id")).alias("b")
                    )
                    .distinct()
                    .collect()
                )
                actual_b = {
                    _lp(f).split("/")[1]
                    for f in refs
                    if "/" in _lp(f) and _lp(f).split("/")[1].startswith("fpb=")
                }
                expected_b = {f"fpb={b}" for b in affected_b}
                if (
                    expected_b <= actual_b
                    and len(actual_b)
                    == src.select("fpb").distinct().count()
                ):
                    keep += [
                        f
                        for f in refs
                        if _lp(f).split("/")[1] in (actual_b - expected_b)
                    ]
                    hit = expected_b & actual_b
                    if hit:
                        (
                            src.filter(F.col("fpb").isin(affected_b))
                            .join(F.broadcast(tomb), "id", "anti")
                            .repartition(F.col("fpb"))
                            .write.mode("overwrite")
                            .partitionBy("fpb")
                            .parquet(tgt)
                        )
                        new_files += _list_new_parquet(root, tgt)
                    continue
            # flat (or unprovable bucketing): full anti-join rewrite
            (
                src.join(F.broadcast(tomb), "id", "anti")
                .write.mode("overwrite")
                .parquet(tgt)
            )
            new_files += _list_new_parquet(root, tgt)
        else:
            keep += refs  # hot sidecars / meta / layout: carried by ref

    _commit(root, keep + new_files, "fold", based_on=cur)
    gc_store(root)

    meta = FL.read_store_meta(root) or {}
    if "n_rows" in meta:
        if removed_rows is not None:
            n_rows = max(0, int(meta["n_rows"]) - removed_rows)
        else:
            df = store_read(spark, root, None)
            n_rows = int(df.count()) if df is not None else 0
        FL.update_store_meta(root, {"n_rows": n_rows})
    if refresh_hot:
        FL._refresh_hot_sidecars(spark, root, part_key, affected_vals)
    return n_tomb


def compact_store_manifest(
    spark: SparkSession,
    path: str,
    target_files_per_partition: int = 1,
    fold_deletes: bool = True,
) -> int:
    """Manifest twin of ``files.compact_store``: fold pending deletes,
    then rewrite the data tree (and any fpb-bucketed ``_fingerprints``
    sidecar) into one fresh generation — partitioned trees come out
    with one file per partition (the hash repartition puts each key in
    exactly one task), flat trees re-range-sort on their key. Commits
    once, garbage-collects after. Returns the number of logical
    directories rewritten."""
    from tiki_data_pipeline_spark.sources import files as FL

    root, pin = split_pin(path)
    if pin is not None:
        raise ValueError(f"cannot compact a pinned snapshot handle {path}")
    if fold_deletes:
        fold_tombstones_manifest(spark, root)
    key, partitioned = store_layout(root)
    count = 0
    if partitioned and key is not None:
        n_dirs = len(data_partition_dirs(root))
        store_put(
            store_read(spark, root, None),
            root,
            "overwrite",
            partition_by=key,
            keep_sidecars=True,
            files_per_partition=target_files_per_partition,
        )
        count += n_dirs
    elif key is not None:
        store_put(
            store_read(spark, root, None),
            root,
            "overwrite",
            range_key=key,
            n_range_files=max(1, target_files_per_partition),
            keep_sidecars=True,
        )
        count += 1
    if FL.store_sub_partitioned(root, "_fingerprints", "fpb"):
        fps = store_read(spark, root, "_fingerprints")
        n_dirs = len(
            {
                _lp(f).split("/")[1]
                for f in manifest_files(root, "_fingerprints")
                if "/" in _lp(f)
            }
        )
        store_put(
            fps,
            root,
            "overwrite",
            partition_by="fpb",
            sub="_fingerprints",
            files_per_partition=target_files_per_partition,
        )
        count += n_dirs
    elif FL.store_sub_exists(root, "_fingerprints"):
        fps = store_read(spark, root, "_fingerprints")
        store_put(
            fps,
            root,
            "overwrite",
            sub="_fingerprints",
            coalesce=max(1, target_files_per_partition),
        )
        count += 1
    count += _compact_decisions_manifest(spark, root)
    gc_store(root)
    return count


def _compact_decisions_manifest(spark: SparkSession, root: str) -> int:
    """Re-group a streaming ``_decisions`` lineage log into ONE
    generation. Every streaming epoch's sub-scoped commit lands its
    leaf in its own generation, and :func:`store_read` unions the
    scope per generation — so a long-running stream grows the
    decisions read plan linearly with epoch count. Compaction reads
    the whole scope (run/epoch partition columns parse off the
    logical paths), writes it back partitioned by (run, epoch) under
    the compaction's single generation, and commits once: same rows,
    same partition values, one read group afterwards. Run in the
    writer's maintenance window only (same single-writer discipline
    as every compact — ``takedown_sink(maintenance_every=)`` calls
    this between epochs, which is that window). The posix twin needs
    no equivalent: its epoch leaves already share one directory tree.
    Skips flat (legacy) decisions layouts — nothing to re-group."""
    refs = [
        f for f in manifest_files(root, "_decisions") if f.endswith(".parquet")
    ]
    gens = {f.split("/", 2)[1] for f in refs if f.startswith(GEN_DIR + "/")}
    partitioned = any("run=" in _lp(f) for f in refs)
    if len(gens) <= 1 or not partitioned:
        return 0
    dec = store_read(spark, root, "_decisions")
    cur = current_gen(root)
    gen_dir = os.path.join(root, GEN_DIR, f"{cur + 1:08d}")
    target = os.path.join(gen_dir, "_decisions")
    (
        dec.repartition(F.col("run"), F.col("epoch"))
        .write.mode("overwrite")
        .partitionBy("run", "epoch")
        .parquet(target)
    )
    new_files = _list_new_parquet(root, target)
    parent_files = read_manifest(root, cur)["files"]
    keep = [f for f in parent_files if not _covered(_lp(f), "_decisions")]
    _commit(root, keep + new_files, "compact:_decisions", based_on=cur)
    return 1


def migrate_store_layout_manifest(
    spark: SparkSession, path: str, partitioned: bool
) -> bool:
    """Manifest twin of ``files.migrate_store_layout``: one rewrite of
    the data tree into the other physical layout, one commit, GC.
    Sidecars carry by reference."""
    root, _ = split_pin(path)
    key, is_part = store_layout(root)
    if key is None:
        raise ValueError(
            f"store at {root} has no recognized bucketing column "
            "(band/bkt/cid) — cannot migrate layout"
        )
    if is_part == partitioned:
        return False
    rows = store_read(spark, root, None)
    if partitioned:
        store_put(rows, root, "overwrite", partition_by=key, keep_sidecars=True)
    else:
        store_put(
            rows, root, "overwrite", range_key=key, n_range_files=4,
            keep_sidecars=True,
        )
    gc_store(root)
    return True
