"""Byte-assemble ``tests/fixtures/foreign_layout.h5`` — an HDF5 file
laid out the way libhdf5 (the engine under h5py) lays files out, NOT
the way our own ``hdf5lite.write`` does. Where h5py itself cannot run
(this container), reading this file is the strongest available
evidence that ``hdf5lite.read``/``read_attrs`` handle third-party
files rather than merely round-tripping their own bytes.

Every structural choice here differs from our writer's output
(hdf5lite.write emits: single-SNOD root, cache_type-1 root entry,
space→dtype→layout message order, no NIL/fill/mtime messages, no
continuations, single-leaf chunk B-trees, deflate-only pipelines, one
GCOL). This file instead uses — all per the public HDF5 File Format
Specification v2, and all shapes libhdf5 emits in the wild:

* root symbol-table entry with **cache_type 0** (no scratch B-tree
  addresses — the reader must parse the root object header's Symbol
  Table message);
* a **level-1 internal group B-tree** over TWO SNOD leaves;
* dataset object headers carrying **NIL (0x0000), old fill value
  (0x0004), new fill value (0x0005) and mtime (0x0012)** messages
  interleaved, with the dataspace/datatype/layout order permuted;
* one header split by an **object header continuation (0x0010)** —
  the layout message lives in the continuation block;
* a chunked dataset behind a **two-level chunk B-tree** with a
  **shuffle + deflate** filter pipeline (v1, named filters);
* a fixed-length string dataset with **null-TERM** padding (class 3,
  pad type 0 — ours writes null-pad);
* a vlen-string dataset whose payloads span **two GCOL collections**;
* a contiguous dataset at **UNDEF address** (allocation deferred —
  reads as zeros);
* a **compact** dataset;
* a dataset inside a two-level nested group, attributes on the root
  group, a subgroup, and a dataset (scalar + 1-D).

Run from the repo root: ``python tools/make_foreign_h5_fixture.py``.
Prints the expected per-dataset aggregate table the
``hdf5_foreign_read`` oracle pins.
"""
from __future__ import annotations

import pathlib
import struct
import zlib

import numpy as np

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
    "fixtures" / "foreign_layout.h5"
UNDEF = 0xFFFFFFFFFFFFFFFF
SIG = b"\x89HDF\r\n\x1a\n"


def pad8(n: int) -> int:
    return (n + 7) & ~7


class W:
    """Append-only file image with 8-byte block alignment."""

    def __init__(self) -> None:
        self.buf = bytearray(b"\x00" * 96)  # superblock, patched last

    def alloc(self, block: bytes) -> int:
        addr = len(self.buf)
        self.buf.extend(block)
        self.buf.extend(b"\x00" * (pad8(len(self.buf)) - len(self.buf)))
        return addr


def msg(mtype: int, body: bytes) -> bytes:
    body += b"\x00" * (pad8(len(body)) - len(body))
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def dt_i8() -> bytes:
    return struct.pack("<B3BIHH", 0x10, 0x08, 0, 0, 8, 0, 64)


def dt_f4() -> bytes:
    return struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4) + \
        struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)


def dt_s(width: int, nullterm: bool = True) -> bytes:
    # pad type 0 = null-terminate (libhdf5's default for C strings)
    bits = 0x00 if nullterm else 0x01
    return struct.pack("<B3BI", 0x13, bits, 0, 0, width)


def dt_vlen_str() -> bytes:
    # class 9, vlen type 1 (string); element = 16-byte heap reference
    return struct.pack("<B3BI", 0x19, 0x01, 0, 0, 16)


def space_1d(n: int) -> bytes:
    return struct.pack("<BBB5xQ", 1, 1, 0, n)


def space_scalar() -> bytes:
    # rank-0 dataspace: what libhdf5 writes for SCALAR attributes
    return struct.pack("<BBB5x", 1, 0, 0)


def fill_old(v: bytes = b"") -> bytes:          # 0x0004
    return struct.pack("<I", len(v)) + v


def fill_new() -> bytes:                        # 0x0005 v2, undefined
    return struct.pack("<BBBB", 2, 2, 1, 0)


def mtime() -> bytes:                           # 0x0012 v1
    return struct.pack("<B3xI", 1, 1_700_000_000)


def attr(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nb = name.encode() + b"\x00"
    body = struct.pack("<BxHHH", 1, len(nb), len(dt), len(ds))
    body += nb + b"\x00" * (pad8(len(nb)) - len(nb))
    body += dt + b"\x00" * (pad8(len(dt)) - len(dt))
    body += ds + b"\x00" * (pad8(len(ds)) - len(ds))
    return body + data


def header(msgs: list[bytes], total_nmsg: int | None = None) -> bytes:
    blob = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, total_nmsg or len(msgs), 1,
                       len(blob)) + blob


def main() -> None:
    w = W()
    expected: dict[str, tuple] = {}

    # ---- a_long: contiguous i8, message zoo + permuted order
    a = np.arange(1, 11, dtype="<i8")
    a_addr = w.alloc(a.tobytes())
    a_attrs = [
        msg(0x000C, attr("units", dt_s(2), space_scalar(), b"m\x00")),
        msg(0x000C, attr("factors", dt_i8(), space_1d(3),
                         np.array([1, 2, 3], "<i8").tobytes())),
    ]
    a_hdr = w.alloc(header([
        msg(0x0000, b"\x00" * 16),                   # NIL
        msg(0x0003, dt_i8()),                        # dtype BEFORE space
        msg(0x0004, fill_old()),                     # old fill value
        msg(0x0001, space_1d(10)),
        msg(0x0012, mtime()),
        msg(0x0005, fill_new()),
        msg(0x0008, struct.pack("<BBQQ", 3, 1, a_addr, a.nbytes)),
    ] + a_attrs))
    expected["a_long"] = (10, str(int(a.sum())))

    # ---- b_float: contiguous f4, header split by a CONTINUATION —
    # the layout message lives in the continuation block
    b = (np.arange(10, dtype="<f4") * 0.25)
    b_addr = w.alloc(b.tobytes())
    cont_blob = msg(0x0008, struct.pack("<BBQQ", 3, 1, b_addr, b.nbytes))
    cont_addr = w.alloc(cont_blob)
    b_hdr = w.alloc(header([
        msg(0x0001, space_1d(10)),
        msg(0x0003, dt_f4()),
        msg(0x0010, struct.pack("<QQ", cont_addr, len(cont_blob))),
    ], total_nmsg=4))  # 3 in the main span + 1 in the continuation
    expected["b_float"] = (10, str(int(b.sum() * 4)))  # exact quarters

    # ---- c_chunk: i8 chunked (rows=3), shuffle+deflate, TWO-LEVEL
    # chunk B-tree (level-1 node over two leaves of 2 chunks each)
    c = np.arange(100, 110, dtype="<i8")
    chunks = []
    for off in range(0, 10, 3):
        block = np.zeros(3, "<i8")
        take = min(3, 10 - off)
        block[:take] = c[off: off + take]
        raw = block.tobytes()
        shuffled = np.frombuffer(raw, np.uint8).reshape(3, 8).T.tobytes()
        comp = zlib.compress(shuffled, 6)
        chunks.append((off, len(comp), w.alloc(comp)))

    def chunk_leaf(entries) -> int:
        blob = bytearray(b"TREE" + struct.pack("<BBHQQ", 1, 0,
                                               len(entries),
                                               UNDEF, UNDEF))
        for off, nb, addr in entries:
            blob += struct.pack("<IIQQQ", nb, 0, off, 0, addr)
        return w.alloc(bytes(blob))

    leaf1 = chunk_leaf(chunks[:2])
    leaf2 = chunk_leaf(chunks[2:])
    root_bt = bytearray(b"TREE" + struct.pack("<BBHQQ", 1, 1, 2,
                                              UNDEF, UNDEF))
    for off, leaf in ((0, leaf1), (6, leaf2)):
        root_bt += struct.pack("<IIQQQ", 0, 0, off, 0, leaf)
    c_bt = w.alloc(bytes(root_bt))
    pipeline = struct.pack("<BB6x", 1, 2)
    for fid, name, cvals in ((2, b"shuffle\x00", (8,)),
                             (1, b"deflate\x00", (6,))):
        pipeline += struct.pack("<HHHH", fid, len(name), 1, len(cvals))
        pipeline += name + b"\x00" * (pad8(len(name)) - len(name))
        pipeline += struct.pack(f"<{len(cvals)}I", *cvals)
        if len(cvals) % 2:
            pipeline += b"\x00" * 4
    c_hdr = w.alloc(header([
        msg(0x0001, space_1d(10)),
        msg(0x000B, pipeline),
        msg(0x0003, dt_i8()),
        msg(0x0008, struct.pack("<BBBQIIx", 3, 2, 2, c_bt, 3, 8)),
    ]))
    expected["c_chunk"] = (10, str(int(c.sum())))

    # ---- d_str: fixed S6, null-TERMINATED padding
    d_vals = [b"alpha", b"bee", b"gamma", b"dd", b"epsil",
              b"zeta", b"eta", b"theta", b"iota", b"kappa"]
    d = np.array(d_vals, dtype="S6")
    d_addr = w.alloc(d.tobytes())
    d_hdr = w.alloc(header([
        msg(0x0003, dt_s(6, nullterm=True)),
        msg(0x0001, space_1d(10)),
        msg(0x0008, struct.pack("<BBQQ", 3, 1, d_addr, d.nbytes)),
    ]))
    expected["d_str"] = (10, "|".join(v.decode() for v in d_vals))

    # ---- e_vlen: vlen strings across TWO GCOL collections
    e_vals = [f"v{i}-{'x' * (i % 5)}" for i in range(10)]

    def gcol(strings) -> tuple[int, list[tuple[int, int]]]:
        body = bytearray()
        refs = []
        for i, s in enumerate(strings, start=1):
            eb = s.encode()
            body += struct.pack("<HHIQ", i, 1, 0, len(eb))
            body += eb + b"\x00" * (pad8(len(eb)) - len(eb))
            refs.append((i, len(eb)))
        body += struct.pack("<HHIQ", 0, 0, 0, 16)
        total = 16 + len(body)
        blob = b"GCOL" + struct.pack("<B3xQ", 1, total) + bytes(body)
        return w.alloc(blob), refs

    g1_addr, g1_refs = gcol(e_vals[:4])
    g2_addr, g2_refs = gcol(e_vals[4:])
    recs = bytearray()
    for (idx, ln) in g1_refs:
        recs += struct.pack("<IQI", ln, g1_addr, idx)
    for (idx, ln) in g2_refs:
        recs += struct.pack("<IQI", ln, g2_addr, idx)
    e_addr = w.alloc(bytes(recs))
    e_hdr = w.alloc(header([
        msg(0x0001, space_1d(10)),
        msg(0x0003, dt_vlen_str()),
        msg(0x0008, struct.pack("<BBQQ", 3, 1, e_addr, len(recs))),
    ]))
    expected["e_vlen"] = (10, "|".join(e_vals))

    # ---- f_zero: contiguous at UNDEF address (allocation deferred)
    f_hdr = w.alloc(header([
        msg(0x0001, space_1d(7)),
        msg(0x0003, dt_i8()),
        msg(0x0008, struct.pack("<BBQQ", 3, 1, UNDEF, 56)),
    ]))
    expected["f_zero"] = (7, "0")

    # ---- g_compact: layout class 0, data inline in the header
    g = np.arange(10, 20, dtype="<i8")
    g_hdr = w.alloc(header([
        msg(0x0001, space_1d(10)),
        msg(0x0003, dt_i8()),
        msg(0x0008, struct.pack("<BBH", 3, 0, g.nbytes) + g.tobytes()),
    ]))
    expected["g_compact"] = (10, str(int(g.sum())))

    # ---- nested group grp/sub/h_nested
    h = np.array([5, 6, 7], dtype="<i8")
    h_addr = w.alloc(h.tobytes())
    h_hdr = w.alloc(header([
        msg(0x0001, space_1d(3)),
        msg(0x0003, dt_i8()),
        msg(0x0008, struct.pack("<BBQQ", 3, 1, h_addr, h.nbytes)),
    ]))
    expected["grp/sub/h_nested"] = (3, str(int(h.sum())))

    def group(entries: dict[str, int], extra: list[bytes] = ()) -> int:
        """Symbol-table group with a SINGLE leaf (for subgroups)."""
        heap = bytearray(b"\x00" * 8)
        offs = {}
        for name in sorted(entries):
            offs[name] = len(heap)
            nb = name.encode() + b"\x00"
            heap += nb + b"\x00" * (pad8(len(nb)) - len(nb))
        heap_data = w.alloc(bytes(heap))
        heap_hdr = w.alloc(b"HEAP" + struct.pack(
            "<B3xQQQ", 0, len(heap), UNDEF, heap_data))
        snod = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0,
                                               len(entries)))
        for name in sorted(entries):
            snod += struct.pack("<QQII16x", offs[name], entries[name],
                                0, 0)
        snod_addr = w.alloc(bytes(snod))
        bt = bytearray(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1,
                                             UNDEF, UNDEF))
        bt += struct.pack("<QQQ", 0, snod_addr,
                          offs[sorted(entries)[-1]])
        bt_addr = w.alloc(bytes(bt))
        st = msg(0x0011, struct.pack("<QQ", bt_addr, heap_hdr))
        return w.alloc(header([st] + list(extra)))

    sub_hdr = group({"h_nested": h_hdr})
    grp_hdr = group({"sub": sub_hdr}, extra=[
        msg(0x000C, attr("level", dt_i8(), space_scalar(),
                         np.array([2], "<i8").tobytes()))])

    # ---- ROOT: level-1 internal B-tree over TWO SNOD leaves
    root_entries = {"a_long": a_hdr, "b_float": b_hdr, "c_chunk": c_hdr,
                    "d_str": d_hdr, "e_vlen": e_hdr, "f_zero": f_hdr,
                    "g_compact": g_hdr, "grp": grp_hdr}
    names = sorted(root_entries)
    heap = bytearray(b"\x00" * 8)
    offs = {}
    for name in names:
        offs[name] = len(heap)
        nb = name.encode() + b"\x00"
        heap += nb + b"\x00" * (pad8(len(nb)) - len(nb))
    heap_data = w.alloc(bytes(heap))
    heap_hdr = w.alloc(b"HEAP" + struct.pack(
        "<B3xQQQ", 0, len(heap), UNDEF, heap_data))

    def snod(sub_names) -> int:
        blob = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0,
                                               len(sub_names)))
        for name in sub_names:
            blob += struct.pack("<QQII16x", offs[name],
                                root_entries[name], 0, 0)
        return w.alloc(bytes(blob))

    leaf_a = snod(names[:4])
    leaf_b = snod(names[4:])
    lt = bytearray(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1,
                                         UNDEF, UNDEF))
    lt += struct.pack("<QQQ", 0, leaf_a, offs[names[3]])
    leaf_a_bt = w.alloc(bytes(lt))
    lt = bytearray(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1,
                                         UNDEF, UNDEF))
    lt += struct.pack("<QQQ", offs[names[3]], leaf_b, offs[names[-1]])
    leaf_b_bt = w.alloc(bytes(lt))
    it = bytearray(b"TREE" + struct.pack("<BBHQQ", 0, 1, 2,
                                         UNDEF, UNDEF))
    it += struct.pack("<QQ", 0, leaf_a_bt)
    it += struct.pack("<QQQ", offs[names[3]], leaf_b_bt,
                      offs[names[-1]])
    root_bt_addr = w.alloc(bytes(it))

    root_hdr = w.alloc(header([
        msg(0x0011, struct.pack("<QQ", root_bt_addr, heap_hdr)),
        msg(0x000C, attr("creator", dt_s(12), space_scalar(),
                         b"libhdf5-like")),
    ]))

    # superblock: cache_type 0 — NO scratch addresses; the reader must
    # go through the root header's symbol-table message
    sb = SIG + struct.pack("<8B2HI", 0, 0, 0, 0, 0, 8, 8, 0, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, len(w.buf), UNDEF)
    sb += struct.pack("<QQII16x", 0, root_hdr, 0, 0)
    w.buf[: len(sb)] = sb

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_bytes(bytes(w.buf))
    print(f"wrote {OUT} ({len(w.buf)} bytes)")
    for k in sorted(expected):
        print(f"  {k}: n={expected[k][0]} agg={expected[k][1]}")


if __name__ == "__main__":
    main()
