"""Minimal pure-Python NetCDF-3 (classic, CDF-1) writer + reader.

The environment has no xarray/netCDF4, which left the reference's final
serialization hop (compile-solrad.py:176-189) unexecutable. NetCDF-3
classic is a simple, fully public binary format (Unidata CDF-1 spec:
header with dim/attr/var lists, then big-endian fixed-width data), so a
fixture-sized writer needs no library. ``write_netcdf3`` emits a valid
classic file readable by any NetCDF tool; ``read_netcdf3`` is the
verification twin used by the round-trip tests (and would read any
fixed-dimension classic file, not just ours).

Scope (deliberate): fixed dimensions only (numrecs=0 — the compiled
export is a complete grid, not an append stream), NC_CHAR and NC_DOUBLE
variables, text and double attributes. That is exactly the CF layout the
reference emits: time(time) double, station(station, strlen) char,
coords(station) double, GHI/DHI/DNI(time, station) double.
"""

from __future__ import annotations

import math
import struct
from typing import Any

NC_CHAR, NC_INT, NC_DOUBLE = 2, 4, 6
_TYPE_SIZE = {NC_CHAR: 1, NC_INT: 4, NC_DOUBLE: 8}
_TYPE_FMT = {NC_INT: ">i", NC_DOUBLE: ">d"}
_ABSENT = struct.pack(">ii", 0, 0)
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 10, 11, 12


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_value(value: Any) -> tuple[int, int, bytes]:
    """(nc_type, nelems, padded payload) for a text or numeric attribute."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return NC_CHAR, len(raw), _pad4(raw)
    vals = list(value) if isinstance(value, (list, tuple)) else [value]
    if all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        return NC_INT, len(vals), _pad4(b"".join(struct.pack(">i", v) for v in vals))
    return NC_DOUBLE, len(vals), _pad4(
        b"".join(struct.pack(">d", float(v)) for v in vals)
    )


def _attr_list(attrs: dict[str, Any]) -> bytes:
    if not attrs:
        return _ABSENT
    out = [struct.pack(">ii", NC_ATTRIBUTE, len(attrs))]
    for name, value in attrs.items():
        nc_type, nelems, payload = _attr_value(value)
        out.append(_name(name) + struct.pack(">ii", nc_type, nelems) + payload)
    return b"".join(out)


def _var_payload(nc_type: int, dims_shape: tuple[int, ...], values) -> bytes:
    n = math.prod(dims_shape) if dims_shape else 1
    if nc_type == NC_CHAR:
        raw = bytes(values)
        if len(raw) != n:
            raise ValueError(f"char var payload {len(raw)} != {n}")
        return _pad4(raw)
    fmt = _TYPE_FMT[nc_type]
    flat = list(values)
    if len(flat) != n:
        raise ValueError(f"var payload {len(flat)} != {n}")
    return _pad4(b"".join(struct.pack(fmt, v) for v in flat))


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: list[dict[str, Any]],
    global_attrs: dict[str, Any] | None = None,
) -> None:
    """Write a classic NetCDF-3 file.

    ``variables``: list of dicts with keys ``name``, ``dims`` (tuple of
    dim names), ``nc_type`` (NC_CHAR/NC_INT/NC_DOUBLE), ``values`` (flat
    row-major iterable; bytes for NC_CHAR), ``attrs`` (optional dict).
    """
    dim_names = list(dims)
    dim_ids = {d: i for i, d in enumerate(dim_names)}

    def var_header(v: dict[str, Any], begin: int) -> bytes:
        shape = tuple(dims[d] for d in v["dims"])
        vsize = len(_var_payload(v["nc_type"], shape, v["values"]))
        return (
            _name(v["name"])
            + struct.pack(">i", len(v["dims"]))
            + b"".join(struct.pack(">i", dim_ids[d]) for d in v["dims"])
            + _attr_list(v.get("attrs") or {})
            + struct.pack(">iii", v["nc_type"], vsize, begin)
        )

    def header(begins: list[int]) -> bytes:
        out = [b"CDF\x01", struct.pack(">i", 0)]  # magic, numrecs=0
        out.append(struct.pack(">ii", NC_DIMENSION, len(dim_names)))
        for d in dim_names:
            out.append(_name(d) + struct.pack(">i", dims[d]))
        out.append(_attr_list(global_attrs or {}))
        if variables:
            out.append(struct.pack(">ii", NC_VARIABLE, len(variables)))
            for v, b in zip(variables, begins):
                out.append(var_header(v, b))
        else:
            out.append(_ABSENT)
        return b"".join(out)

    # Two-pass: header size is independent of the begin VALUES (fixed-width
    # int32 offsets), so lay out with zeros first, then fill real offsets.
    payloads = [
        _var_payload(v["nc_type"], tuple(dims[d] for d in v["dims"]), v["values"])
        for v in variables
    ]
    base = len(header([0] * len(variables)))
    begins, off = [], base
    for p in payloads:
        begins.append(off)
        off += len(p)
    with open(path, "wb") as fh:
        fh.write(header(begins))
        for p in payloads:
            fh.write(p)


def read_netcdf3(path: str) -> dict[str, Any]:
    """Parse a fixed-dimension classic NetCDF-3 file back into
    ``{"dims": {...}, "attrs": {...}, "vars": {name: {"dims": (...),
    "attrs": {...}, "values": [...]}}}`` — the round-trip verification
    twin of :func:`write_netcdf3`."""
    data = open(path, "rb").read()
    if data[:4] != b"CDF\x01":
        raise ValueError("not a classic CDF-1 file")
    pos = 8  # skip magic + numrecs (fixed dims only)

    def read_i4() -> int:
        nonlocal pos
        (v,) = struct.unpack_from(">i", data, pos)
        pos += 4
        return v

    def read_name() -> str:
        nonlocal pos
        n = read_i4()
        s = data[pos : pos + n].decode("utf-8")
        pos += n + (-n % 4)
        return s

    def read_attrs() -> dict[str, Any]:
        nonlocal pos
        tag, count = read_i4(), read_i4()
        attrs: dict[str, Any] = {}
        for _ in range(count if tag == NC_ATTRIBUTE else 0):
            name = read_name()
            nc_type, nelems = read_i4(), read_i4()
            size = _TYPE_SIZE[nc_type] * nelems
            raw = data[pos : pos + size]
            pos += size + (-size % 4)
            if nc_type == NC_CHAR:
                attrs[name] = raw.decode("utf-8")
            else:
                fmt = ">" + _TYPE_FMT[nc_type][1] * nelems
                vals = list(struct.unpack(fmt, raw))
                attrs[name] = vals[0] if nelems == 1 else vals
        return attrs

    tag, ndims = read_i4(), read_i4()
    dim_names, dim_sizes = [], []
    for _ in range(ndims if tag == NC_DIMENSION else 0):
        dim_names.append(read_name())
        dim_sizes.append(read_i4())
    gattrs = read_attrs()
    tag, nvars = read_i4(), read_i4()
    out_vars: dict[str, Any] = {}
    for _ in range(nvars if tag == NC_VARIABLE else 0):
        name = read_name()
        nd = read_i4()
        vdims = tuple(dim_names[read_i4()] for _ in range(nd))
        vattrs = read_attrs()
        nc_type, vsize, begin = read_i4(), read_i4(), read_i4()
        shape = tuple(dim_sizes[dim_names.index(d)] for d in vdims)
        n = math.prod(shape) if shape else 1
        raw = data[begin : begin + _TYPE_SIZE[nc_type] * n]
        if nc_type == NC_CHAR:
            values: Any = raw
        else:
            values = list(struct.unpack(">" + _TYPE_FMT[nc_type][1] * n, raw))
        out_vars[name] = {"dims": vdims, "attrs": vattrs, "values": values}
    return {
        "dims": dict(zip(dim_names, dim_sizes)),
        "attrs": gattrs,
        "vars": out_vars,
    }
