"""Byte-assemble ``tests/fixtures/reference_table.tpz`` exactly as the
REFERENCE implementation writes its archives — so the repo holds a
migration fixture our own ``save_tpz`` writer did NOT produce.

Mimics ``Table.save`` (reference tablite/base.py:1350-1418) member by
member:

* ``table.yml`` first, via ``yaml.safe_dump(..., sort_keys=False,
  allow_unicode=True, default_flow_style=None)`` — the reference's
  exact dump call;
* page members named ``{pid}-{counter}.npy`` (reference
  ``SimplePage.next_id``, tablite/base.py:95-105) written with
  ``np.save(..., allow_pickle=True, fix_imports=False)``;
* object pages are pickles of a ``tablite.datatypes.MetaArray``
  ndarray SUBCLASS (tablite/base.py:195 saves the MetaArray itself),
  so the embedded class path matches what a real reference process
  embeds — the property that breaks plain ``np.load`` readers;
* page dtypes follow ``pytype_from_iterable``
  (tablite/datatypes.py:756-801): one-type str → ``<U``, one-type
  int/float/bool → native, datetime/date → datetime64, any mixture
  (incl. None) → object;
* a page repeated WITHIN a column's page list (the ``t *= n`` shape,
  stored once) and one page SHARED by two columns (the column-copy
  shape — the reference writer emits a duplicate zip member for it,
  and so do we);
* ``zipfile.ZIP_DEFLATED`` at ``compresslevel=1`` (the reference
  defaults).

Run from the repo root: ``python tools/make_reference_tpz_fixture.py``
(regenerates the committed fixture deterministically — fixed pid,
fixed data, zip entries carry a fixed timestamp).
"""
from __future__ import annotations

import datetime as dt
import io
import pathlib
import sys
import types
import warnings
import zipfile

import numpy as np
import yaml

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
    "fixtures" / "reference_table.tpz"
PID = 54321  # fixed fake pid -> deterministic member names
ZTIME = (2024, 1, 1, 0, 0, 0)  # fixed member timestamp


def _install_metaarray_alias() -> type:
    """Register a minimal ndarray subclass under the module path the
    reference defines it at (``tablite.datatypes.MetaArray``,
    tablite/datatypes.py:805) so ``np.save`` pickles object pages
    with the same embedded class path a real reference process does.
    Only this generator process is polluted."""
    class MetaArray(np.ndarray):
        pass
    MetaArray.__module__ = "tablite.datatypes"
    MetaArray.__qualname__ = "MetaArray"
    pkg = types.ModuleType("tablite")
    mod = types.ModuleType("tablite.datatypes")
    mod.MetaArray = MetaArray
    pkg.datatypes = mod
    sys.modules["tablite"] = pkg
    sys.modules["tablite.datatypes"] = mod
    return MetaArray


def _npy_bytes(arr: np.ndarray) -> bytes:
    bio = io.BytesIO()
    np.save(bio, arr, allow_pickle=True, fix_imports=False)
    return bio.getvalue()


def main() -> None:
    MetaArray = _install_metaarray_alias()

    def obj_page(vals: list) -> np.ndarray:
        a = np.empty(len(vals), dtype=object)
        a[:] = vals
        return a.view(MetaArray)  # pickles as tablite.datatypes.MetaArray

    counter = iter(range(1, 100))

    def pid_name() -> str:
        return f"{PID}-{next(counter)}.npy"

    # (page name -> bytes); column -> ordered page-name list
    pages: dict[str, bytes] = {}
    cols: dict[str, list[str]] = {}

    def add(column: str, *arrays, repeat_first: int = 1,
            share_from: str | None = None) -> None:
        if share_from is not None:
            cols[column] = list(cols[share_from])
            return
        names = []
        for arr in arrays:
            n = pid_name()
            pages[n] = _npy_bytes(arr)
            names.append(n)
        cols[column] = names[:1] * repeat_first + names[1:] if \
            repeat_first > 1 else names

    big = 2 ** 60 + 1
    add("n_key", np.array([1, 2, 3], dtype=np.int64),
        np.array([4, 5, 6], dtype=np.int64))
    add("name", np.array(["alpha", "bravo", "charlie"]),
        np.array(["delta", "écho", "foxtrot"]))  # '<U' unicode pages
    add("maybe_note", obj_page(["x", None, "y", None, "z", None]))
    add("amount", obj_page([big, None, 3, 4, None, -7]))
    add("score", np.array([0.5, 1.25, -3.5, 2.0, 4.75, 10.0]))
    add("ok", np.array([True, False, True, False, True, False]))
    add("created", np.array(
        [dt.datetime(2021, 1, 1) + dt.timedelta(hours=i * 7)
         for i in range(6)], dtype="datetime64[us]"))
    add("day", np.array([dt.date(2020, 1, 1) + dt.timedelta(days=i)
                         for i in range(6)], dtype="datetime64[D]"))
    # page repeated within the column (t *= 2, stored once)
    add("列 tag", np.array(["red", "green", "blue"]), repeat_first=2)
    add("dup_a", np.array([10, 20, 30, 40, 50, 60], dtype=np.int64))
    add("dup_b", share_from="dup_a")  # column copy: same page name

    yml = yaml.safe_dump(
        {"columns": {n: {"pages": p} for n, p in cols.items()}},
        sort_keys=False, allow_unicode=True, default_flow_style=None)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(OUT, "w", compression=zipfile.ZIP_DEFLATED,
                         compresslevel=1) as zf:
        def put(name: str, data) -> None:
            info = zipfile.ZipInfo(name, date_time=ZTIME)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)

        put("table.yml", yml)  # reference writes the manifest first
        with warnings.catch_warnings():
            # the reference writer emits a DUPLICATE member for a page
            # shared across columns (per-column set() iteration,
            # tablite/base.py:1405-1410) — reproduce that faithfully
            warnings.simplefilter("ignore", UserWarning)
            for col, names in cols.items():
                for n in set(names):
                    put(n, pages[n])
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, "
          f"{len(cols)} columns)")


if __name__ == "__main__":
    main()
