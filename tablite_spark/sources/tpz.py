"""Native ``.tpz`` archive interop — the reference's on-disk table
format (reference: tablite/base.py:1350-1453 ``Table.save``/``Table.load``).

Format (public, defined entirely by the reference implementation):
a zip archive containing

* ``table.yml`` — ``{"columns": {<name>: {"pages": [<file>, ...]}}}``
  serialized with PyYAML ``safe_dump(sort_keys=False,
  allow_unicode=True, default_flow_style=None)``;
* one ``<id>.npy`` member per page, written with ``np.save`` (object
  dtype pages are pickled — the reference loads with
  ``allow_pickle=True``, see tablite/base.py:1447).

The same page file may appear several times in a column's page list
(the reference dedups storage for ``t *= 1000``-style repeats:
tablite/base.py:1405-1408) — the page SEQUENCE, repeats included, is
the column's row order.

Scale note: ``.tpz`` is a single-file, driver-written archive — it is
the reference's *migration* format, not a cluster format. This module
exists so a reference user can read their existing archives on day
one; the scale path is ``load_tpz(...)`` → ``save(df, "...parquet")``
once, then parquet from there on. Reading streams one page at a time
(bounded by page size, reference default 1M values/page); writing
iterates Arrow batches so the driver never holds more than one page.
"""

from __future__ import annotations

import io as _io
import pathlib
import pickle
import re
import zipfile

import numpy as np

from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_tpz", "save_tpz"]


# ---------------------------------------------------------------- yaml
def _parse_manifest(text: str) -> dict[str, list[str]]:
    """Parse ``table.yml`` into {column: [page file, ...]}.

    Uses PyYAML when importable; otherwise a fallback parser that
    covers exactly the subset ``safe_dump`` emits for the reference's
    two-level document: a ``columns:`` mapping whose values are
    ``pages:`` flow lists (possibly wrapped across lines) or block
    lists. Column names may be single/double-quoted unicode.
    """
    try:
        import yaml
        doc = yaml.safe_load(text)
        return {str(k): [str(p) for p in v["pages"]]
                for k, v in doc["columns"].items()}
    except ImportError:
        pass
    cols: dict[str, list[str]] = {}
    cur: str | None = None
    in_flow = False
    buf = ""

    def _unquote(s: str) -> str:
        s = s.strip()
        if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
            inner = s[1:-1]
            return inner.replace("''", "'") if s[0] == "'" else \
                inner.encode().decode("unicode_escape")
        return s

    def _flush_flow() -> None:
        nonlocal buf, in_flow
        items = [p.strip() for p in buf.strip().lstrip("[").rstrip("]")
                 .split(",")]
        cols[cur] = [_unquote(p) for p in items if p]
        buf, in_flow = "", False

    for line in text.splitlines():
        if not line.strip() or line.strip().startswith("#") or \
                line.startswith("%"):
            continue
        if in_flow:
            buf += " " + line.strip()
            if line.rstrip().endswith("]"):
                _flush_flow()
            continue
        if re.match(r"^columns\s*:", line):
            continue
        m = re.match(r"^  (\S.*?):\s*$", line)
        if m:
            cur = _unquote(m.group(1))
            cols[cur] = []
            continue
        m = re.match(r"^\s+pages\s*:\s*(\[.*)$", line)
        if m and cur is not None:
            buf = m.group(1)
            if buf.rstrip().endswith("]"):
                in_flow = True
                _flush_flow()
            else:
                in_flow = True
            continue
        m = re.match(r"^\s+-\s+(.*)$", line)
        if m and cur is not None:
            cols[cur].append(_unquote(m.group(1)))
    return cols


def _dump_manifest(cols: dict[str, list[str]]) -> str:
    """Emit ``table.yml`` byte-compatible with the reference's layout."""
    try:
        import yaml
        return yaml.safe_dump({"columns": {n: {"pages": p}
                                           for n, p in cols.items()}},
                              sort_keys=False, allow_unicode=True,
                              default_flow_style=None)
    except ImportError:
        def q(s: str) -> str:
            if re.fullmatch(r"[A-Za-z0-9_.\-]+", s):
                return s
            return "'" + s.replace("'", "''") + "'"
        lines = ["columns:"]
        for name, pages in cols.items():
            lines.append(f"  {q(name)}:")
            lines.append("    pages: [" + ", ".join(pages) + "]")
        return "\n".join(lines) + "\n"


# ---------------------------------------------------------------- load
class _MetaArrayShim(np.ndarray):
    """Stand-in for the reference's ``tablite.datatypes.MetaArray``
    (an ndarray subclass carrying a ``metadata`` dict — reference
    tablite/datatypes.py:805). The reference's object pages are
    written by ``np.save(MetaArray(...), allow_pickle=True)``, so the
    embedded pickle stream names the SUBCLASS: a plain
    ``np.load`` without tablite installed dies with
    ModuleNotFoundError. This shim receives those pickles instead
    (the metadata dict is not part of ndarray pickle state, so
    nothing is lost)."""


#: pickle globals a ``.tpz`` object page may legitimately reference:
#: numpy's array/scalar reconstruction plus the plain data classes the
#: reference stores (tablite/datatypes.py pytype zoo). Anything else —
#: os.system, subprocess, arbitrary classes — is refused, so
#: ``allow_pickle=True`` on this reader is NOT the arbitrary-code-
#: execution hazard raw ``np.load(allow_pickle=True)`` is.
_SAFE_PICKLE_GLOBALS = {
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy", "int8"), ("numpy", "int16"), ("numpy", "int32"),
    ("numpy", "int64"), ("numpy", "uint64"),
    ("numpy", "float16"), ("numpy", "float32"), ("numpy", "float64"),
    ("numpy", "bool_"), ("numpy", "str_"), ("numpy", "datetime64"),
    ("numpy", "timedelta64"),
    ("datetime", "date"), ("datetime", "datetime"),
    ("datetime", "time"), ("datetime", "timedelta"),
    ("datetime", "timezone"),
    ("zoneinfo", "ZoneInfo"),
    ("pytz", "_UTC"), ("pytz", "_p"),  # tz-aware datetime payloads
    ("decimal", "Decimal"),
    ("_codecs", "encode"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "MetaArray" and module.split(".", 1)[0] == "tablite":
            return _MetaArrayShim
        if (module, name) in _SAFE_PICKLE_GLOBALS:
            import importlib
            return getattr(importlib.import_module(module), name)
        raise pickle.UnpicklingError(
            f"{module}.{name} is not an allowed global in a .tpz "
            f"object page (data classes only)")


def _load_page_array(raw: bytes, allow_pickle: bool,
                     member: str) -> np.ndarray:
    """Decode one ``.npy`` zip member. Non-object pages go through
    ``np.load(allow_pickle=False)`` (pure buffer decode). Object
    pages — the reference's mixed/None-bearing columns — are
    unpickled through :class:`_RestrictedUnpickler` so that (a) real
    reference archives load WITHOUT tablite installed and (b) a
    malicious archive cannot name executable globals."""
    from numpy.lib import format as npf
    bio = _io.BytesIO(raw)
    version = npf.read_magic(bio)
    if version == (1, 0):
        _, _, dtype = npf.read_array_header_1_0(bio)
    elif version == (2, 0):
        _, _, dtype = npf.read_array_header_2_0(bio)
    else:  # future npy versions: defer entirely to numpy
        dtype = np.dtype(object)
        bio = None
    if not dtype.hasobject and bio is not None:
        return np.load(_io.BytesIO(raw), allow_pickle=False,
                       fix_imports=False)
    if not allow_pickle:
        raise ValueError(
            f"object page {member!r} requires allow_pickle=True "
            f"(trusted archives only; unpickling is restricted to "
            f"data classes)")
    if bio is None:
        return np.load(_io.BytesIO(raw), allow_pickle=True,
                       fix_imports=False)
    arr = _RestrictedUnpickler(bio).load()
    return np.asarray(arr, dtype=object)


def _column_to_series(vals: list):
    """One-inferred-type-per-column materialization (SURVEY §1.3
    documented deviation: the reference keeps mixed python types per
    page; we land the dominant type and stringify true mixtures)."""
    import datetime as _dt

    import pandas as pd

    def _is_null(v) -> bool:
        if v is None or (isinstance(v, float) and v != v):
            return True
        try:  # pd.NaT: not None, not float, but != itself
            return bool(v != v)
        except Exception:
            return False

    vals = [None if _is_null(v) else v for v in vals]
    non_null = [v for v in vals if v is not None]
    kinds = {type(v) for v in non_null}
    if not kinds:
        return pd.Series([None] * len(vals), dtype="object"), "string"
    if kinds <= {bool}:
        return pd.Series([None if v is None else bool(v) for v in vals],
                         dtype="object"), "boolean"
    if kinds <= {int, bool, np.integer}:
        # object int/None, NOT pandas Int64: the non-Arrow
        # createDataFrame path degrades Int64-with-nulls to float64,
        # corrupting values above 2^53
        return pd.Series([None if v is None else int(v) for v in vals],
                         dtype="object"), "long"
    if kinds <= {int, float, bool, np.integer, np.floating}:
        return pd.Series([None if v is None else float(v) for v in vals],
                         dtype="float64"), "double"
    if kinds <= {_dt.datetime}:
        return pd.Series(vals, dtype="object"), "timestamp"
    if kinds <= {_dt.date}:
        return pd.Series(vals, dtype="object"), "date"
    if kinds <= {str}:
        return pd.Series([None if v is None else v for v in vals],
                         dtype="object"), "string"
    # time / timedelta / genuine mixtures → ISO-ish strings
    return pd.Series([None if v is None else str(v) for v in vals],
                     dtype="object"), "string"


def load_tpz(spark: SparkSession, path: str,
             columns: list[str] | None = None,
             allow_pickle: bool = False) -> DataFrame:
    """Read a reference ``.tpz`` archive into a DataFrame
    (tablite/base.py:1420-1453 ``Table.load`` parity).

    ``allow_pickle`` defaults to ``False``: a ``.tpz`` from an
    untrusted source must not execute arbitrary pickles on open
    (``np.load`` object pages are full pickle streams). Numeric /
    unicode pages load either way; archives holding object pages —
    any reference column containing ``None`` — need an explicit
    ``allow_pickle=True`` opt-in for TRUSTED archives, which is how
    the reference itself always loads (tablite/base.py:1447).
    """
    import pandas as pd

    with zipfile.ZipFile(path, "r") as zf:
        manifest = _parse_manifest(zf.read("table.yml").decode("utf-8"))
        if columns is not None:
            missing = [c for c in columns if c not in manifest]
            if missing:
                raise ValueError(f"columns not in archive: {missing}")
            manifest = {c: manifest[c] for c in columns}
        data: dict[str, pd.Series] = {}
        types: dict[str, str] = {}
        page_cache: dict[str, list] = {}
        for name, pages in manifest.items():
            vals: list = []
            for page in pages:
                if page not in page_cache:
                    arr = _load_page_array(zf.read(page),
                                           allow_pickle, page)
                    page_cache[page] = arr.tolist()
                vals.extend(page_cache[page])
            page_cache.clear()
            data[name], types[name] = _column_to_series(vals)

    n_rows = {len(s) for s in data.values()}
    if len(n_rows) > 1:
        raise ValueError(f"ragged columns in {path}: "
                         f"{ {k: len(v) for k, v in data.items()} }")
    pdf = pd.DataFrame(data)
    schema = ", ".join(f"`{n}` {t}" for n, t in types.items())
    return spark.createDataFrame(pdf, schema=schema)


# ---------------------------------------------------------------- save
def save_tpz(df: DataFrame, path: str, page_rows: int = 1_000_000,
             compression: int = zipfile.ZIP_DEFLATED,
             compresslevel: int = 1) -> str:
    """Write a DataFrame as a reference-loadable ``.tpz`` archive
    (tablite/base.py:1350-1418 ``Table.save`` parity: same manifest
    layout, same default deflate level 1).

    Pages are cut every ``page_rows`` rows (reference
    ``Config.PAGE_SIZE`` default 1M). The table is Arrow-collected on
    the driver first — a ``.tpz`` is a single driver-written zip, the
    same shape as the reference's own save; for cluster-scale exports
    use ``save``/``save_sharded`` (parquet) instead. Timestamps
    and dates land as object pages of ``datetime``/``date`` (what the
    reference stores); integers/floats/bools as native-dtype pages;
    strings as unicode pages (no pickle needed on read-back).

    Exactness: nullable INTEGER columns are written as object pages
    of Python ``int``/``None`` (what the reference stores) — never as
    a float64 fallback, which would silently corrupt values above
    2^53 and degrade long→double on reload.
    """
    p = pathlib.Path(path)
    if p.suffix != ".tpz":
        p = p.parent / (p.name + ".tpz")
    names = df.columns
    pages: dict[str, list[str]] = {n: [] for n in names}
    page_id = 0
    buf: list = []  # pandas DataFrames awaiting a page cut
    buffered = 0

    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")

    def _page_array(series) -> np.ndarray:
        if series.dtype.kind in ("i", "f", "b"):
            return series.to_numpy()
        if series.dtype.kind == "M":  # datetime64 → objects like the ref
            if getattr(series.dtype, "tz", None) is not None:
                # store NAIVE session-wall-clock datetimes (what the
                # reference stores; also keeps tz classes out of the
                # pickle stream so the restricted reader accepts it)
                series = series.dt.tz_convert(session_tz) \
                               .dt.tz_localize(None)
            out = [None if v is None or v != v else v.to_pydatetime()
                   for v in series]
            return np.array(out, dtype=object)
        vals = series.tolist()
        def _py(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            import datetime as _dt
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                from zoneinfo import ZoneInfo
                return v.astimezone(ZoneInfo(session_tz)) \
                        .replace(tzinfo=None)
            if isinstance(v, np.bool_):
                return bool(v)
            if isinstance(v, np.integer):
                return int(v)
            if isinstance(v, np.floating):
                return float(v)
            return v
        vals = [_py(v) for v in vals]
        if all(isinstance(v, str) for v in vals) and vals:
            return np.array(vals)  # '<U' page, loads without pickle
        out = np.empty(len(vals), dtype=object)
        out[:] = vals  # plain python ints survive > 2^53 exactly
        return out

    with zipfile.ZipFile(p, "w", compression=compression,
                         compresslevel=compresslevel) as zf:
        def _cut(pdf) -> None:
            nonlocal page_id
            page_id += 1
            for i, n in enumerate(names):
                fname = f"{page_id * len(names) + i}.npy"
                bio = _io.BytesIO()
                np.save(bio, _page_array(pdf[n]), allow_pickle=True)
                zf.writestr(fname, bio.getvalue())
                pages[n].append(fname)

        import pandas as pd
        for batch in df.toArrow().to_batches(max_chunksize=page_rows):
            # integer_object_nulls: an int column with nulls lands as
            # object int/None — NOT float64, which corrupts > 2^53
            buf.append(batch.to_pandas(integer_object_nulls=True))
            buffered += batch.num_rows
            while buffered >= page_rows:
                whole = pd.concat(buf, ignore_index=True)
                _cut(whole.iloc[:page_rows])
                rest = whole.iloc[page_rows:].reset_index(drop=True)
                buf, buffered = ([rest], len(rest)) if len(rest) else ([], 0)
        if buffered or page_id == 0:
            tail = (pd.concat(buf, ignore_index=True) if buf
                    else pd.DataFrame({n: [] for n in names}))
            _cut(tail)
        zf.writestr("table.yml", _dump_manifest(pages))
    return str(p)
