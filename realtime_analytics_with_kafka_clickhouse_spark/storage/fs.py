"""Hadoop FileSystem operations for table maintenance.

Storage maintenance (partition drops, atomic-ish directory swaps, merge
markers) must work wherever the table lives — HDFS, S3A, GCS, local — so
everything goes through the Hadoop FileSystem API of the active session's
JVM rather than POSIX ``shutil``/``pathlib`` (which silently do nothing
against an object store).

Caveat, stated rather than hidden: directory rename is atomic on HDFS and
POSIX but copy+delete on S3A.  The merge protocol therefore also records a
batch-id marker *inside* the swapped directory (state and data travel
together), and replayed batches are skipped by id — so a crash mid-swap is
repaired by replaying the batch, not by trusting rename atomicity.  A
production deployment on object storage would use a transactional table
format (Delta/Iceberg) for the same contract.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.exists(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs(spark, path)
    return fs.delete(p, recursive)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, src_p = _fs(spark, src)
    _, dst_p = _fs(spark, dst)
    return fs.rename(src_p, dst_p)


def mkdirs(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.mkdirs(p)


def list_dir(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] if missing."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


SWAP_SUFFIX = ".swap-"


def swap_tmp_path(path: str) -> str:
    """A fresh ``path.swap-<uuid>`` sibling — the ONE naming convention every
    directory-replacing writer (merge, compaction, TTL rewrite) must use, so
    ``recover_latest_swap``/``cleanup_swaps`` cover all of them."""
    return f"{path}{SWAP_SUFFIX}{uuid.uuid4().hex[:8]}"


def swap_in(spark: SparkSession, path: str, tmp: str) -> None:
    """Replace ``path`` with the fully-written ``tmp`` sibling and clear
    stale swaps.  A crash between delete and rename is repaired by the next
    ``recover_latest_swap(path)`` call — which every swap-writing entry
    point runs first."""
    delete(spark, path)
    rename(spark, tmp, path)
    cleanup_swaps(spark, path)


def recover_latest_swap(spark: SparkSession, path: str) -> bool:
    """Crash repair for the delete-then-rename swap: if ``path`` is missing
    but an orphaned ``path.swap-*`` sibling exists (crash landed between
    delete and rename), promote the most recently modified one.  Returns
    True if a recovery happened."""
    if exists(spark, path):
        return False
    fs_, p = _fs(spark, path)
    parent = p.getParent()
    if parent is None or not fs_.exists(parent):
        return False
    base = p.getName() + SWAP_SUFFIX
    candidates = [
        st
        for st in fs_.listStatus(parent)
        if st.isDirectory() and st.getPath().getName().startswith(base)
    ]
    if not candidates:
        return False
    latest = max(candidates, key=lambda st: st.getModificationTime())
    fs_.rename(latest.getPath(), p)
    # Any older orphans are stale partial writes — drop them.
    for st in candidates:
        if st.getPath().getName() != latest.getPath().getName() and fs_.exists(st.getPath()):
            fs_.delete(st.getPath(), True)
    return True


def cleanup_swaps(spark: SparkSession, path: str) -> int:
    """Delete stale ``path.swap-*`` siblings (partial writes from crashed
    attempts).  Only call when ``path`` itself is intact."""
    fs_, p = _fs(spark, path)
    parent = p.getParent()
    if parent is None or not fs_.exists(parent):
        return 0
    base = p.getName() + SWAP_SUFFIX
    n = 0
    for st in fs_.listStatus(parent):
        if st.getPath().getName().startswith(base):
            fs_.delete(st.getPath(), True)
            n += 1
    return n


def replicate_dir(spark: SparkSession, src: str, dsts: list[str]) -> None:
    """Copy one (small) directory to N destinations through Hadoop
    ``FileUtil.copy`` — no Spark jobs.  Used to fan a schema-bearing
    empty-table template out to every fully-annihilated bucket in a
    keyed merge: one write job + N cheap FS copies instead of N jobs."""
    fs_, src_p = _fs(spark, src)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for d in dsts:
        # dst must NOT pre-exist: FileUtil.copy into an existing dir nests
        # src under dst/<srcName>; into an absent path it copies the
        # directory contents to dst itself (what we want).  Enforced, not
        # just documented — a pre-existing destination would silently
        # produce a nested, unreadable directory.
        dst_p = jvm.org.apache.hadoop.fs.Path(d)
        if fs_.exists(dst_p):
            raise IOError(
                f"replicate_dir: destination already exists: {d}"
                " (FileUtil.copy would nest the source under it)"
            )
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            fs_, src_p, fs_, dst_p, False, True, conf
        )


def swap_partition_dirs(
    spark: SparkSession,
    table_dir: str,
    stage: str,
    names: list[str],
    marker: tuple[str, str] | None = None,
    max_threads: int = 8,
) -> None:
    """Batched hidden-swap pass: for each child ``name`` (e.g.
    ``bucket=3``) present under ``stage``, optionally drop a marker file
    INSIDE the staged dir, then promote it over ``table_dir/name`` via
    the ``.{name}.swap-*`` crash protocol (rename staged → hidden swap
    sibling, delete target, rename into place).

    Two costs the naive per-bucket loop pays that this one doesn't:
    every ``fs.<op>`` call re-derives the FileSystem handle through py4j
    (hoisted here to ONE handle for the whole pass), and the swaps run
    serially (independent per bucket — fanned over a small thread pool;
    py4j gives each Python thread its own gateway connection, and Hadoop
    FileSystem instances are thread-safe).

    Crash states are identical to the serial protocol
    (``_recover_bucket_swaps``): a hidden swap whose target survived was
    never applied (dropped on repair); one whose target vanished is
    promoted.  The marker travels inside the directory through every
    rename, so marker and data stay atomic per bucket."""
    from concurrent.futures import ThreadPoolExecutor

    fs_, _ = _fs(spark, table_dir)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path

    if marker is not None:
        marker_name, marker_value = marker
        payload = bytearray(marker_value.encode("utf-8"))
        for name in names:
            out = fs_.create(jpath(f"{stage}/{name}/{marker_name}"), True)
            try:
                out.write(payload)
            finally:
                out.close()

    def _swap(name: str) -> None:
        # Hadoop FileSystem rename/delete report failure by RETURNING
        # false, not raising — check each step, or a silently failed
        # stage->tmp rename would let the delete(final) below destroy the
        # bucket's live data with nothing promoted to replace it.
        tmp = jpath(f"{table_dir}/.{name}{SWAP_SUFFIX}{uuid.uuid4().hex[:8]}")
        final = jpath(f"{table_dir}/{name}")
        if not fs_.rename(jpath(f"{stage}/{name}"), tmp):
            raise IOError(f"swap_partition_dirs: rename {stage}/{name} -> {tmp} failed")
        if fs_.exists(final) and not fs_.delete(final, True):
            raise IOError(f"swap_partition_dirs: delete {final} failed")
        if not fs_.rename(tmp, final):
            raise IOError(f"swap_partition_dirs: rename {tmp} -> {final} failed")

    if len(names) <= 1:
        for name in names:
            _swap(name)
    else:
        with ThreadPoolExecutor(max_workers=min(max_threads, len(names))) as ex:
            # list() re-raises the first worker exception, if any.
            list(ex.map(_swap, names))


def dir_size(spark: SparkSession, path: str) -> int:
    """Total bytes of data files under a directory (recursive), ignoring
    hidden/marker files."""
    fs_, p = _fs(spark, path)
    it = fs_.listFiles(p, True)
    total = 0
    while it.hasNext():
        st = it.next()
        if not st.getPath().getName().startswith(("_", ".")):
            total += st.getLen()
    return total


def mtime_ms(spark: SparkSession, path: str) -> int:
    """Modification time (epoch millis) of a file or directory."""
    fs_, p = _fs(spark, path)
    return fs_.getFileStatus(p).getModificationTime()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Small-file read (markers); None if missing.

    One ``readAllBytes`` py4j call (r14 optimization): the previous
    byte-at-a-time ``stream.read()`` loop paid one JVM round trip PER BYTE
    — ~200 ms for a 20 KB commit manifest; the bulk read is ~1 ms and is
    plain java.io.InputStream API, so it works on any Hadoop FileSystem."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Small-file overwrite-write (markers)."""
    fs, p = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def _is_already_exists_error(e: Exception) -> bool:
    """True only for a Java FileAlreadyExistsException (java.nio or
    org.apache.hadoop.fs) — the one exception that means "lost the commit
    race" rather than a transient IO failure."""
    try:
        from py4j.protocol import Py4JJavaError
    except ImportError:  # pragma: no cover
        return False
    if not isinstance(e, Py4JJavaError):
        return False
    return e.java_exception.getClass().getName().endswith("FileAlreadyExistsException")


def create_exclusive(spark: SparkSession, path: str, content: str) -> bool:
    """Atomic create-if-absent (the transaction-log commit primitive):
    returns False if ``path`` already exists — the caller lost the commit
    race and must re-read table state and retry.  Any other failure raises:
    conflating transient IO errors with a lost race would surface as a
    bogus "gave up after N commit races".

    On ``file://`` the Hadoop RawLocalFileSystem's ``create(p, false)`` is
    exists-then-create, NOT O_EXCL — two racing local processes could both
    win — so the local path routes through java.nio ``Files.createFile``
    (a true exclusive create).  HDFS ``create`` is atomic server-side; on
    S3A this maps to a conditional PUT (If-None-Match) in recent releases,
    and older object stores need an external commit coordinator — the same
    requirement Delta's LogStore has.
    """
    fs, p = _fs(spark, path)
    parent = p.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    jvm = spark._jvm
    if fs.getScheme() == "file":
        # java.nio Paths.get / Files.createFile are Java varargs overloads
        # Py4J cannot resolve; java.io.File.createNewFile() is
        # overload-unambiguous and atomically creates-if-absent (O_EXCL on
        # POSIX), returning False when the file already exists.
        jfile = jvm.java.io.File(p.toUri().getPath())
        if not jfile.createNewFile():
            return False
        stream = fs.create(p, True)  # we own the (empty) file now
    else:
        try:
            stream = fs.create(p, False)
        except Exception as e:
            if _is_already_exists_error(e):
                return False
            raise
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    return True
