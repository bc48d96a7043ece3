"""Filesystem + misc utilities — ``hl.hadoop_*`` / ``hl.utils`` parity.

Parity target: hail/python/hail/utils/hadoop_utils.py. The reference
routes these through its backend's Hadoop filesystem abstraction; here
they route through ``fsspec`` when the path has a scheme fsspec knows
(s3://, gs://, hdfs:// — present on real clusters alongside pyspark)
and fall back to the local filesystem for bare paths, which is also
what a ``local[N]`` session resolves them to. Text mode, globbing and
the stat dict shape follow the reference's documented behavior.
"""

from __future__ import annotations

import glob as _glob
import io
import json
import os
import shutil
import tempfile
from typing import Any


def _fs(path: str):
    """(filesystem, path) — fsspec for scheme'd paths, None for local."""
    if "://" in path:
        try:
            import fsspec

            fs, p = fsspec.core.url_to_fs(path)
            return fs, p
        except ImportError as exc:
            raise RuntimeError(
                f"path '{path}' has a URL scheme but fsspec is not installed"
            ) from exc
    return None, path


def hadoop_open(path: str, mode: str = "r", buffer_size: int = 8192):
    """Open a file (ref hadoop_utils.py:12 ``hl.hadoop_open``).
    Supports r/w/x and binary variants; gzipped paths are transparently
    (de)compressed like the reference."""
    fs, p = _fs(path)
    raw_mode = mode if "b" in mode else mode + "b"
    raw = fs.open(p, raw_mode) if fs else open(p, raw_mode, buffering=buffer_size)
    if p.endswith(".gz") or p.endswith(".bgz"):
        import gzip

        raw = gzip.open(raw, raw_mode)
    if "b" in mode:
        return raw
    return io.TextIOWrapper(raw)


def hadoop_exists(path: str) -> bool:
    fs, p = _fs(path)
    return fs.exists(p) if fs else os.path.exists(p)


def hadoop_is_file(path: str) -> bool:
    fs, p = _fs(path)
    return fs.isfile(p) if fs else os.path.isfile(p)


def hadoop_is_dir(path: str) -> bool:
    fs, p = _fs(path)
    return fs.isdir(p) if fs else os.path.isdir(p)


def hadoop_stat(path: str) -> dict[str, Any]:
    """Stat dict in the reference's shape (ref hadoop_utils.py:211):
    path / size_bytes / size / is_dir / modification_time / owner."""
    fs, p = _fs(path)
    if fs:
        info = fs.info(p)
        size = int(info.get("size") or 0)
        is_dir = info.get("type") == "directory"
        mtime = info.get("mtime")
    else:
        st = os.stat(p)
        size = st.st_size
        is_dir = os.path.isdir(p)
        mtime = st.st_mtime
    return {
        "path": path,
        "size_bytes": size,
        "size": _human(size),
        "is_dir": is_dir,
        "modification_time": mtime,
        "owner": "",
    }


def hadoop_ls(path: str) -> list[dict[str, Any]]:
    """List a directory or glob (ref hadoop_utils.py:241)."""
    fs, p = _fs(path)
    if fs:
        entries = fs.ls(p, detail=False)
        return [hadoop_stat(e if "://" in e else path.split("://")[0] + "://" + e) for e in entries]
    if os.path.isdir(p):
        entries = sorted(os.path.join(p, e) for e in os.listdir(p))
    else:
        entries = sorted(_glob.glob(p))
    return [hadoop_stat(e) for e in entries]


def hadoop_copy(src: str, dest: str) -> None:
    """Copy one file (ref hadoop_utils.py:275). Scheme'd paths stream
    through open handles; local paths use shutil."""
    sfs, sp = _fs(src)
    dfs, dp = _fs(dest)
    if sfs is None and dfs is None:
        shutil.copyfile(sp, dp)
        return
    with hadoop_open(src, "rb") as fin, hadoop_open(dest, "wb") as fout:
        shutil.copyfileobj(fin, fout)


def hadoop_scheme_supported(scheme: str) -> bool:
    """Whether a URL scheme is readable here (ref hadoop_utils.py:305)."""
    if scheme in ("", "file"):
        return True
    try:
        import fsspec

        return scheme in fsspec.available_protocols()
    except ImportError:
        return False


def _human(n: int) -> str:
    for unit in ("B", "K", "M", "G", "T", "P"):
        if n < 1024:
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n:.1f}E"


class TemporaryFilename:
    """Context manager yielding a fresh temp file path, removed on exit
    (ref utils/__init__.py TemporaryFilename)."""

    def __init__(self, prefix: str = "", suffix: str = "", dir: str | None = None):
        fd, self.name = tempfile.mkstemp(prefix=prefix, suffix=suffix, dir=dir)
        os.close(fd)
        os.unlink(self.name)

    def __enter__(self) -> str:
        return self.name

    def __exit__(self, *exc) -> None:
        if os.path.exists(self.name):
            if os.path.isdir(self.name):
                shutil.rmtree(self.name, ignore_errors=True)
            else:
                os.unlink(self.name)


class TemporaryDirectory:
    """Context manager yielding a fresh temp dir path, removed on exit
    (ref utils/__init__.py TemporaryDirectory)."""

    def __init__(self, prefix: str = "", suffix: str = "", dir: str | None = None):
        self.name = tempfile.mkdtemp(prefix=prefix, suffix=suffix, dir=dir)

    def __enter__(self) -> str:
        return self.name

    def __exit__(self, *exc) -> None:
        shutil.rmtree(self.name, ignore_errors=True)


# ------------------------------------------------------------------ #
# value types (ref hail/utils/struct.py, hail/utils/interval.py)
# ------------------------------------------------------------------ #
class Struct(dict):
    """Nested annotation structure (ref utils/struct.py:10): a mapping
    whose fields read as attributes — ``Struct(foo=5).foo == 5``.
    Spark rows convert losslessly: ``Struct(**row.asDict())``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    def __repr__(self):
        return "Struct(" + ", ".join(f"{k}={v!r}" for k, v in self.items()) + ")"

    def annotate(self, **kwargs) -> "Struct":
        out = Struct(self)
        out.update(kwargs)
        return out

    def select(self, *fields, **kwargs) -> "Struct":
        out = Struct({k: self[k] for k in fields})
        out.update(kwargs)
        return out

    def drop(self, *fields) -> "Struct":
        return Struct({k: v for k, v in self.items() if k not in fields})


class Interval:
    """Half-open-by-default interval value (ref utils/interval.py):
    start/end with inclusivity flags; ``contains`` mirrors the engine's
    interval-join predicate (expr/genome.py)."""

    def __init__(self, start, end, includes_start: bool = True, includes_end: bool = False):
        self.start = start
        self.end = end
        self.includes_start = includes_start
        self.includes_end = includes_end

    def contains(self, value) -> bool:
        lo = value >= self.start if self.includes_start else value > self.start
        hi = value <= self.end if self.includes_end else value < self.end
        return lo and hi

    def overlaps(self, other: "Interval") -> bool:
        return self.contains(other.start) or other.contains(self.start)

    def __eq__(self, other):
        return isinstance(other, Interval) and (
            self.start, self.end, self.includes_start, self.includes_end
        ) == (other.start, other.end, other.includes_start, other.includes_end)

    def __hash__(self):
        return hash((self.start, self.end, self.includes_start, self.includes_end))

    def __repr__(self):
        lb = "[" if self.includes_start else "("
        rb = "]" if self.includes_end else ")"
        return f"Interval{lb}{self.start!r}, {self.end!r}{rb}"


# Batch-region sentinel (ref utils/misc.py:674) — meaningless for a
# Spark deployment but part of the public surface.
ANY_REGION = ["any_region"]


# ------------------------------------------------------------------ #
# misc utility surface (ref hail/utils/__init__.py __all__: misc.py,
# deduplicate.py, frozendict.py, linkedlist.py, jsonx.py, java.py,
# genomic_range_table.py, tutorial.py)
# ------------------------------------------------------------------ #
class FatalError(Exception):
    """ref utils/java.py FatalError — engine-fatal failure."""


class HailUserError(Exception):
    """ref utils/java.py HailUserError — user-expression failure."""


class frozendict(dict):
    """Immutable, hashable dict (ref utils/frozendict.py)."""

    def __hash__(self):
        return hash(frozenset(self.items()))

    def _blocked(self, *a, **k):
        raise TypeError("frozendict is immutable")

    __setitem__ = __delitem__ = _blocked
    pop = popitem = clear = update = setdefault = _blocked


class LinkedList:
    """Immutable cons list (ref utils/linkedlist.py): push returns a
    new list sharing the tail."""

    def __init__(self, type_=None):
        self.node = None

    def push(self, *xs) -> "LinkedList":
        out = self
        for x in xs:
            nxt = LinkedList()
            nxt.node = (x, out.node)
            out = nxt
        return out

    def __iter__(self):
        n = self.node
        while n is not None:
            yield n[0]
            n = n[1]

    def __len__(self):
        return sum(1 for _ in self)

    def __repr__(self):
        return f"LinkedList({list(self)})"


class JSONEncoder(json.JSONEncoder):
    """ref utils/jsonx.py — also serializes Struct/frozendict/sets."""

    def default(self, o):
        if isinstance(o, (Struct, frozendict)):
            return dict(o)
        if isinstance(o, (set, frozenset)):
            return sorted(o)
        if hasattr(o, "isoformat"):
            return o.isoformat()
        return super().default(o)


def wrap_to_list(s):
    if isinstance(s, list):
        return s
    if isinstance(s, tuple):
        return list(s)
    return [s]


def chunk(size: int, seq):
    for pos in range(0, len(seq), size):
        yield seq[pos : pos + size]


def maybe(f, ma, default=None):
    return f(ma) if ma is not None else default


def get_env_or_default(maybe_value, envvar: str, default):
    import os as _os

    return maybe_value if maybe_value is not None else _os.environ.get(envvar, default)


def deduplicate(ids, *, max_attempts=None, already_used=None):
    """Suffix-rename duplicate strings (ref utils/deduplicate.py):
    returns ([(old, new), ...], unique_ids)."""
    used = set(already_used if already_used is not None else [])
    renames = []
    out = []
    for name in ids:
        if name in used:
            i = 1
            new = f"{name}_{i}"
            while new in used:
                i += 1
                if max_attempts is not None and i > max_attempts:
                    raise ValueError(f"deduplicate: gave up on {name!r}")
                new = f"{name}_{i}"
            renames.append((name, new))
            name = new
        used.add(name)
        out.append(name)
    return renames, out


def error(msg: str) -> None:
    import logging

    logging.getLogger("hail_spark").error(msg)


def warning(msg: str) -> None:
    import logging

    logging.getLogger("hail_spark").warning(msg)


def info(msg: str) -> None:
    import logging

    logging.getLogger("hail_spark").info(msg)


default_handler = print


def storage_level(level: str = "MEMORY_AND_DISK"):
    from pyspark import StorageLevel

    return getattr(StorageLevel, level)


def guess_cloud_spark_provider():
    import os as _os

    if "HAIL_DATAPROC" in _os.environ:
        return "dataproc"
    if "AZURE_SPARK" in _os.environ or "hdinsight" in _os.environ.get("CLASSPATH", ""):
        return "hdinsight"
    return None


def no_service_backend(unsupported_feature: str):
    raise NotImplementedError(
        f"{unsupported_feature} is a Batch-service feature; this engine runs on Spark"
    )


def local_path_uri(path: str) -> str:
    import os as _os

    return "file://" + _os.path.abspath(path)


def uri_path(uri: str) -> str:
    from urllib.parse import urlparse

    return urlparse(uri).path or uri


def timestamp_path(base: str, suffix: str = "") -> str:
    import datetime as _dt

    return "".join([base, "-", _dt.datetime.now().strftime("%Y%m%d-%H%M"), suffix])


def new_local_temp_dir(suffix=None, prefix=None, dir=None) -> str:
    import tempfile as _tf

    return _tf.mkdtemp(suffix, prefix, dir)


def new_local_temp_file(suffix=None, prefix=None, dir=None) -> str:
    import tempfile as _tf

    fd, path = _tf.mkstemp(suffix, prefix, dir)
    import os as _os

    _os.close(fd)
    return path


def new_temp_file(prefix=None, extension=None) -> str:
    import uuid as _uuid

    from .session import tmp_dir

    name = (prefix + "-" if prefix else "") + _uuid.uuid4().hex
    if extension:
        name += "." + extension
    import os as _os

    return _os.path.join(tmp_dir(), name)


class with_local_temp_file:
    """Context manager yielding a temp path, removed on exit (ref
    utils/misc.py with_local_temp_file)."""

    def __init__(self, suffix=None):
        self.suffix = suffix
        self.path = None

    def __enter__(self):
        self.path = new_local_temp_file(suffix=self.suffix)
        return self.path

    def __exit__(self, *exc):
        import os as _os

        try:
            _os.remove(self.path)
        except OSError:
            pass
        return False


def run_command(args) -> str:
    import subprocess as _sp

    res = _sp.run(args, capture_output=True, text=True)
    if res.returncode != 0:
        raise FatalError(f"command failed ({res.returncode}): {res.stderr[:500]}")
    return res.stdout


def range_table(n: int, n_partitions: int | None = None):
    """Row-index table (ref utils/misc.py:83 hl.utils.range_table)."""
    from .session import get_spark
    from .table import Table

    return Table.range(get_spark(), n, n_partitions)


def genomic_range_table(n: int, n_partitions: int | None = None, reference_genome: str = "default"):
    """Table keyed by the first n loci of the reference genome (ref
    utils/genomic_range_table.py)."""
    from pyspark.sql import functions as F

    from .expr.genome import default_reference, get_reference
    from .session import get_spark
    from .table import Table

    rg = default_reference() if reference_genome == "default" else get_reference(reference_genome)
    t = Table.range(get_spark(), n, n_partitions)
    idx = t.df.columns[0]
    df = t.df.select(
        rg.locus_from_global_position(F.col(idx)).alias("locus")
    )
    return Table(df, ("locus",))


def _dumps_partitions(partitions) -> str:
    return json.dumps(partitions, cls=JSONEncoder)


def _tutorial_gate(name: str):
    raise EnvironmentError(
        f"{name}: tutorial datasets are downloaded from Hail's public "
        "hosting; no network access in this environment"
    )


def get_1kg(output_dir: str, overwrite: bool = False):
    _tutorial_gate("get_1kg")


def get_hgdp(output_dir: str, overwrite: bool = False):
    _tutorial_gate("get_hgdp")


def get_movie_lens(output_dir: str, overwrite: bool = False):
    _tutorial_gate("get_movie_lens")


def range_matrix_table(n_rows: int, n_cols: int, n_partitions: int | None = None):
    """ref utils/misc.py hl.utils.range_matrix_table."""
    from .matrixtable import range_matrix_table as _rmt
    from .session import get_spark

    return _rmt(get_spark(), n_rows, n_cols, n_partitions)
