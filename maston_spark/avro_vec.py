"""Vectorized (numpy + pyarrow) Avro batch decoder.

This is the scale-safe executable serde path when the ``spark-avro``
jar is absent: instead of walking each record in Python
(:func:`maston_spark.avro_codec.compile_record_decoder` inside
``mapInPandas``), whole Arrow batches are decoded with numpy array
ops inside ``mapInArrow`` — the per-*record* Python loop becomes a
per-*field* sequence of vectorized passes over the batch's
concatenated payload buffer. See ``tools/bench_avro.py`` for the
measured speedup committed alongside this module.

Parity target is unchanged: serdes/VavrSafeDeserializer.java:29-39 —
never throw; malformed payloads become ``err`` rows with the raw
bytes preserved. The vectorized pass never *classifies* problems —
any record it cannot fully decode (truncated varint, bad framing,
bad union branch, out-of-range int, >8-byte decimal body, non-UTF-8
string) is routed to the compiled per-record decoder, which either
produces the value (legal-but-rare shapes like a 9-byte decimal
body) or raises the same :class:`AvroDecodeError` the per-record
path always raised — so error classes/messages stay byte-identical
between engines.

Supported schema subset = the codec's subset: primitives,
``["null", X]`` unions, decimal-logical-type bytes.
:func:`compile_batch_decoder` raises ``ValueError`` for anything
else; callers fall back to the per-record path wholesale.

Design notes (how each construct vectorizes):

- **varint** — at most 10 data-dependent iterations, each a gather +
  mask update over only the records still inside a continuation
  byte; the common 1-2-byte case finishes in the first passes, so
  cost is O(max varint bytes), not O(records × bytes).
- **union** — branch varint, then the non-null subset is handed to
  the child decoder under a selection mask; positions advance only
  for selected records.
- **string/bytes** — length varint, then one fancy-indexed gather
  (``np.repeat``/``arange`` trick) builds the contiguous Arrow
  values buffer directly; offsets are a cumsum. No per-record
  slicing, and the result feeds ``pa.Array.from_buffers`` with zero
  further copies.
- **decimal** — bodies ≤ 8 bytes (any precision ≤ 18, and the usual
  encoding of larger precisions) are right-aligned into an (k, 8)
  matrix, viewed as big-endian int64, sign-extended with arithmetic
  shifts, and written into the 16-byte little-endian decimal128
  buffer Arrow wants. Longer bodies → per-record path.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from maston_spark.avro_codec import (
    AvroDecodeError,
    _capped_decimal,
    _is_decimal,
    _type_name,
    compile_record_decoder,
    compile_record_encoder,
)

__all__ = [
    "compile_batch_decoder",
    "compile_batch_encoder",
    "BatchDecodeResult",
    "arrow_type_for",
    "arrow_struct_type",
    "resolve_struct",
]

_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1


class _St:
    """Per-batch decode state over the concatenated payload buffer."""

    __slots__ = ("data", "pos", "end", "active", "fallback")

    def __init__(self, data, pos, end, active):
        self.data = data          # uint8[*], all payload bytes of the batch
        self.pos = pos            # int64[n] current absolute offset
        self.end = end            # int64[n] record end offset
        self.active = active      # bool[n] still decoding vectorized
        self.fallback = np.zeros(len(pos), dtype=bool)  # -> per-record pass

    def bail(self, mask: np.ndarray) -> None:
        """Route ``mask`` records to the per-record decoder."""
        if mask.any():
            self.fallback |= mask
            self.active &= ~mask

    def bail_at(self, idx: np.ndarray) -> None:
        if len(idx):
            self.fallback[idx] = True
            self.active[idx] = False


def _read_varint(st: _St, sel: np.ndarray) -> np.ndarray:
    """Zigzag varint at ``st.pos`` for records in ``sel`` (⊆ active).

    Advances ``pos`` past the varint; records with truncated or
    >10-byte varints are bailed. Returns decoded int64 values
    (garbage outside ``sel`` / bailed rows).
    """
    n = len(st.pos)
    acc = np.zeros(n, dtype=np.uint64)
    reading = sel & st.active
    shift = 0
    while reading.any():
        idx = np.nonzero(reading)[0]
        p = st.pos[idx]
        trunc = p >= st.end[idx]
        if trunc.any():
            st.bail_at(idx[trunc])
            idx, p = idx[~trunc], p[~trunc]
            if not len(idx):
                break
        b = st.data[p]
        if shift == 63:
            # only the low bit fits at shift 63; higher payload bits or
            # a continuation byte would pass 64 bits (per-record twin
            # rejects the same inputs)
            over = (b & 0xFE) != 0
            if over.any():
                st.bail_at(idx[over])
                idx, b = idx[~over], b[~over]
                if not len(idx):
                    break
        acc[idx] |= (b.astype(np.uint64) & np.uint64(0x7F)) << np.uint64(shift)
        st.pos[idx] += 1
        more = (b & 0x80) != 0
        reading = np.zeros(n, dtype=bool)
        reading[idx[more]] = True
        shift += 7
    # zigzag decode (unsigned acc -> signed value)
    return ((acc >> np.uint64(1)).astype(np.int64)) ^ -((acc & np.uint64(1)).astype(np.int64))


def _gather(data, starts, lengths):
    """Row-wise concatenate ``data[starts[i] : starts[i]+lengths[i]]``.

    Returns (values uint8, offsets int64[n+1]) — the Arrow
    variable-length layout, built with one fancy-indexed gather.
    """
    offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8), offs
    idx = np.repeat(starts - offs[:-1], lengths) + np.arange(total, dtype=np.int64)
    return data[idx], offs


def _validity(valid: np.ndarray):
    """bool[n] -> Arrow validity bitmap buffer (LSB bit order)."""
    return pa.array(valid).buffers()[1]


# --- column accumulators: full-batch-size numpy state the per-record
# fallback can patch row-wise before the single Arrow conversion


class _NumCol:
    def __init__(self, n: int, kind: str):
        self.kind = kind  # int | long | float | double | boolean
        dtype = {"int": np.int64, "long": np.int64, "float": np.float32,
                 "double": np.float64, "boolean": bool}[kind]
        self.values = np.zeros(n, dtype=dtype)
        self.valid = np.zeros(n, dtype=bool)

    def patch(self, i: int, v: Any) -> None:
        if v is not None:
            self.values[i] = v
            self.valid[i] = True

    def to_arrow(self, data=None) -> pa.Array:
        typ = {"int": pa.int32(), "long": pa.int64(), "float": pa.float32(),
               "double": pa.float64(), "boolean": pa.bool_()}[self.kind]
        vals = self.values.astype(np.int32) if self.kind == "int" else self.values
        return pa.array(vals, type=typ, mask=~self.valid)


class _BinCol:
    def __init__(self, n: int, is_str: bool):
        self.is_str = is_str
        self.starts = np.zeros(n, dtype=np.int64)   # into the batch buffer
        self.lengths = np.zeros(n, dtype=np.int64)
        self.valid = np.zeros(n, dtype=bool)
        self.patched: dict[int, bytes] = {}

    def patch(self, i: int, v: Any) -> None:
        if v is None:
            return
        self.valid[i] = True
        self.lengths[i] = 0  # content comes from `patched`, not the buffer
        self.patched[i] = v.encode("utf-8") if isinstance(v, str) else bytes(v)

    def clear(self, idx: np.ndarray) -> None:
        self.valid[idx] = False
        self.lengths[idx] = 0

    def to_arrow(self, data) -> pa.Array:
        values, offs = _gather(data, self.starts, self.lengths)
        if self.patched:
            # splice fallback-row bytes into the contiguous buffer:
            # O(#patched) python ops, vectorized chunk copies between
            extra = np.zeros(len(self.lengths), dtype=np.int64)
            for i, b in self.patched.items():
                extra[i] = len(b)
            new_offs = np.zeros_like(offs)
            np.cumsum(self.lengths + extra, out=new_offs[1:])
            out = np.empty(int(new_offs[-1]), dtype=np.uint8)
            for i, b in self.patched.items():
                out[new_offs[i]: new_offs[i] + len(b)] = np.frombuffer(b, dtype=np.uint8)
            prev = 0
            for i in sorted(self.patched) + [len(self.lengths)]:
                if i > prev:
                    src0, src1 = offs[prev], offs[i]
                    out[new_offs[prev]: new_offs[prev] + (src1 - src0)] = values[src0:src1]
                prev = i + 1
            values, offs = out, new_offs
        typ = pa.string() if self.is_str else pa.binary()
        if int(offs[-1]) >= 2**31:
            # int32 Arrow offsets would silently wrap and corrupt
            # values; fail loudly with the actionable knob instead
            raise AvroDecodeError(
                "batch string/bytes payload exceeds 2 GiB; lower "
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        arr = pa.Array.from_buffers(
            typ, len(self.valid),
            [_validity(self.valid),
             pa.py_buffer(np.ascontiguousarray(offs.astype(np.int32)).tobytes()),
             pa.py_buffer(values.tobytes())],
        )
        if self.is_str:
            arr.validate(full=True)  # UTF-8 check; invalid rows re-routed by caller
        return arr

    def bad_utf8_rows(self, data) -> np.ndarray:
        bad = []
        for i in np.nonzero(self.valid)[0]:
            if int(i) in self.patched:
                continue  # came from the per-record decoder, already str
            s0, l0 = int(self.starts[i]), int(self.lengths[i])
            try:
                bytes(data[s0: s0 + l0]).decode("utf-8")
            except UnicodeDecodeError:
                bad.append(i)
        return np.asarray(bad, dtype=np.int64)


class _DecCol:
    def __init__(self, n: int, precision: int, scale: int):
        self.precision = precision
        self.scale = scale
        self.buf = np.zeros((n, 2), dtype=np.int64)  # little-endian int128 (lo, hi)
        self.valid = np.zeros(n, dtype=bool)

    def patch(self, i: int, v: Any) -> None:
        if v is None:
            return
        unscaled = int(v.scaleb(self.scale))
        raw = unscaled.to_bytes(16, "little", signed=True)
        self.buf[i, 0] = np.int64(int.from_bytes(raw[:8], "little", signed=True))
        self.buf[i, 1] = np.int64(int.from_bytes(raw[8:], "little", signed=True))
        self.valid[i] = True

    def to_arrow(self, data=None) -> pa.Array:
        return pa.Array.from_buffers(
            pa.decimal128(self.precision, self.scale), len(self.valid),
            [_validity(self.valid),
             pa.py_buffer(np.ascontiguousarray(self.buf).tobytes())],
        )


def _compile_field(sch: Any):
    """Compile an Avro (sub)schema to ``dec(st, sel, col)``: decode
    one value for records in ``sel``, advancing ``st.pos`` and
    writing into column accumulator ``col``."""
    if isinstance(sch, list):
        if len(sch) != 2 or "null" not in sch:
            raise ValueError(f"unsupported union {sch!r}")
        null_idx = sch.index("null")
        child = _compile_field(sch[1 - null_idx])

        def dec_union(st, sel, col):
            branch = _read_varint(st, sel)
            sel = sel & st.active
            st.bail(sel & ~((branch == 0) | (branch == 1)))
            sel = sel & st.active
            child(st, sel & (branch != null_idx), col)

        return dec_union

    if _is_decimal(sch):
        scale = int(sch.get("scale", 0))
        p, s = _capped_decimal(sch)

        def dec_decimal(st, sel, col, _scale=scale, _p=p, _s=s):
            ln = _read_varint(st, sel)
            sel = sel & st.active
            idx = np.nonzero(sel)[0]
            p0 = st.pos[idx]
            bad = (ln[idx] < 0) | (p0 + ln[idx] > st.end[idx])
            # >8-byte bodies are legal (e.g. precision-64 schemas) but
            # rare — the per-record path decodes them exactly
            wide = ~bad & (ln[idx] > 8)
            if bad.any() or wide.any():
                st.bail_at(idx[bad | wide])
                keep = ~(bad | wide)
                idx, p0 = idx[keep], p0[keep]
            lens = ln[idx]
            st.pos[idx] = p0 + lens
            if not len(idx):
                return
            # right-align big-endian bodies into (k, 8), view >i8, then
            # sign-extend the low len*8 bits with arithmetic shifts
            k = len(idx)
            total = int(lens.sum())
            mat = np.zeros((k, 8), dtype=np.uint8)
            if total:
                pref = np.concatenate(([0], np.cumsum(lens)[:-1]))
                within = np.arange(total, dtype=np.int64) - np.repeat(pref, lens)
                gidx = np.repeat(p0, lens) + within
                dst = np.repeat(np.arange(k, dtype=np.int64) * 8 + (8 - lens), lens) + within
                mat.reshape(-1)[dst] = st.data[gidx]
            v = mat.view(">i8")[:, 0].astype(np.int64)
            shift = np.where(lens == 0, 0, (8 - lens) * 8)
            v = np.left_shift(v, shift) >> shift  # len=0 -> unscaled 0
            valid = np.ones(k, dtype=bool)
            if _s < _scale:  # capped scale: only exact rescales survive
                q, r = np.divmod(v, 10 ** (_scale - _s))
                valid &= r == 0
                v = np.where(valid, q, 0)
            if _p <= 18:  # int64 values can exceed 10^p only when p <= 18
                valid &= np.abs(v) < 10**_p
            keep = idx[valid]
            col.buf[keep, 0] = v[valid]
            col.buf[keep, 1] = v[valid] >> 63  # sign fill
            col.valid[keep] = True

        return dec_decimal

    t = _type_name(sch)
    if t in ("int", "long"):
        is_int = t == "int"

        def dec_intlong(st, sel, col, _is_int=is_int):
            v = _read_varint(st, sel)
            sel = sel & st.active
            if _is_int:
                st.bail(sel & ((v < _INT32_MIN) | (v > _INT32_MAX)))
                sel = sel & st.active
            col.values[sel] = v[sel]
            col.valid[sel] = True

        return dec_intlong

    if t == "boolean":

        def dec_bool(st, sel, col):
            idx = np.nonzero(sel & st.active)[0]
            trunc = st.pos[idx] >= st.end[idx]
            if trunc.any():
                st.bail_at(idx[trunc])
                idx = idx[~trunc]
            col.values[idx] = st.data[st.pos[idx]] != 0
            col.valid[idx] = True
            st.pos[idx] += 1

        return dec_bool

    if t in ("float", "double"):
        width = 4 if t == "float" else 8
        dt = np.dtype("<f4") if t == "float" else np.dtype("<f8")

        def dec_fp(st, sel, col, _w=width, _dt=dt):
            idx = np.nonzero(sel & st.active)[0]
            trunc = st.pos[idx] + _w > st.end[idx]
            if trunc.any():
                st.bail_at(idx[trunc])
                idx = idx[~trunc]
            if not len(idx):
                return
            p0 = st.pos[idx]
            gidx = (p0[:, None] + np.arange(_w, dtype=np.int64)).reshape(-1)
            col.values[idx] = np.ascontiguousarray(
                st.data[gidx].reshape(-1, _w)
            ).view(_dt)[:, 0]
            col.valid[idx] = True
            st.pos[idx] = p0 + _w

        return dec_fp

    if t in ("bytes", "string"):
        is_str = t == "string"

        def dec_bytes(st, sel, col, _is_str=is_str):
            ln = _read_varint(st, sel)
            sel = sel & st.active
            idx = np.nonzero(sel)[0]
            p0 = st.pos[idx]
            bad = (ln[idx] < 0) | (p0 + ln[idx] > st.end[idx])
            if bad.any():
                st.bail_at(idx[bad])
                idx, p0 = idx[~bad], p0[~bad]
            col.starts[idx] = p0
            col.lengths[idx] = ln[idx]
            col.valid[idx] = True
            st.pos[idx] = p0 + ln[idx]

        return dec_bytes

    raise ValueError(f"unsupported avro type {sch!r}")


def _make_col(n: int, sch: Any):
    if isinstance(sch, list):
        return _make_col(n, [b for b in sch if b != "null"][0])
    if _is_decimal(sch):
        p, s = _capped_decimal(sch)
        return _DecCol(n, p, s)
    t = _type_name(sch)
    if t in ("int", "long", "float", "double", "boolean"):
        return _NumCol(n, t)
    if t in ("bytes", "string"):
        return _BinCol(n, t == "string")
    raise ValueError(f"unsupported avro type {sch!r}")


class BatchDecodeResult:
    """Result of one decoded Arrow batch.

    ``ok`` — StructArray of decoded records (null for input-null,
    error, and not-yet-merged rows). ``errors`` — {row index:
    exception} for records the per-record fallback also rejected;
    the caller turns these into its ``err`` column.
    """

    __slots__ = ("ok", "errors")

    def __init__(self, ok: pa.StructArray, errors: dict[int, Exception]):
        self.ok = ok
        self.errors = errors


def arrow_type_for(sch: Any) -> pa.DataType:
    """Arrow type a decoded Avro (sub)schema yields — the pyarrow
    twin of :func:`maston_spark.avro_codec.spark_type_for` for the
    vectorizable subset."""
    if isinstance(sch, list):
        branches = [b for b in sch if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"unsupported union {sch!r}")
        return arrow_type_for(branches[0])
    if _is_decimal(sch):
        p, s = _capped_decimal(sch)
        return pa.decimal128(p, s)
    t = _type_name(sch)
    mapping = {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "bytes": pa.binary(),
        "string": pa.string(),
    }
    if t in mapping:
        return mapping[t]
    raise ValueError(f"unsupported avro type {sch!r}")


def arrow_struct_type(schema: dict) -> pa.DataType:
    return pa.struct(
        [pa.field(f["name"], arrow_type_for(f["type"])) for f in schema["fields"]]
    )


def resolve_struct(ok: pa.StructArray, spec: list, reader: dict) -> pa.StructArray:
    """Project a WRITER-shaped decoded StructArray to the READER
    shape per :func:`maston_spark.avro_codec.resolution_spec` —
    whole-column Arrow ops (select / cast / constant fill), zero
    per-record Python. Row validity carries over from ``ok``.
    """
    import pyarrow.compute as pc

    n = len(ok)
    arrays, names = [], []
    for rf, entry in zip(reader["fields"], spec):
        names.append(rf["name"])
        typ = arrow_type_for(rf["type"])
        if entry[0] == "default":
            v = entry[1]
            if v is None:
                arrays.append(pa.nulls(n, typ))
            else:
                if pa.types.is_binary(typ) and isinstance(v, str):
                    v = v.encode("latin-1")  # Avro JSON bytes-default encoding
                arrays.append(pa.array([v] * n, type=typ))
        else:
            arr = ok.field(entry[1])
            if arr.type != typ:
                # Avro-spec promotions (int→long/float/double, …,
                # string↔bytes). string→bytes cannot fail; bytes→string
                # validates UTF-8 and raises ArrowInvalid on non-UTF8
                # writer bytes — callers (validated.py dec_fast) catch
                # that and re-route the group per record so only the
                # offending rows become err rows.
                arr = arr.cast(typ)
            arrays.append(arr)
    mask = pc.invert(ok.is_valid())
    return pa.StructArray.from_arrays(arrays, names=names, mask=mask)


def compile_batch_decoder(schema: dict):
    """Compile ``schema`` into ``fn(value_array, confluent) -> BatchDecodeResult``.

    ``value_array`` is a pyarrow Binary/LargeBinary array of (framed)
    payloads. Rows the vectorized pass cannot handle are re-decoded
    with the compiled per-record codec — successes are spliced into
    the output, failures land in ``result.errors`` with the exact
    exception the per-record path raises.

    Raises ``ValueError`` at compile time for schema features outside
    the codec subset, so callers can fall back wholesale.
    """
    field_specs = [(f["name"], f["type"]) for f in schema["fields"]]
    field_decs = [_compile_field(t) for _, t in field_specs]
    names = [name for name, _ in field_specs]
    record_decode = compile_record_decoder(schema)

    def decode(value_array: pa.Array, confluent: bool = True) -> BatchDecodeResult:
        if isinstance(value_array, pa.ChunkedArray):
            value_array = value_array.combine_chunks()
        n = len(value_array)
        null_in = value_array.is_null().to_numpy(zero_copy_only=False)
        bufs = value_array.buffers()
        odt = np.int64 if pa.types.is_large_binary(value_array.type) else np.int32
        raw_offs = (
            np.frombuffer(bufs[1], dtype=odt)[
                value_array.offset: value_array.offset + n + 1
            ].astype(np.int64)
            if bufs[1] is not None
            else np.zeros(n + 1, dtype=np.int64)
        )
        data = (np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None else np.empty(0, dtype=np.uint8))
        starts, ends = raw_offs[:-1].copy(), raw_offs[1:].copy()
        lengths = ends - starts

        st = _St(data, starts.copy(), ends, ~null_in)
        if confluent:
            if len(data):
                first = data[np.minimum(starts, len(data) - 1)]
            else:
                first = np.zeros(n, dtype=np.uint8)
            st.bail(st.active & ((lengths < 5) | (first != 0)))
            st.pos += 5  # magic + 4-byte schema id

        cols = [_make_col(n, t) for _, t in field_specs]
        for dec, col in zip(field_decs, cols):
            dec(st, st.active.copy(), col)
        # trailing-bytes check (per-record twin raises the same)
        st.bail(st.active & (st.pos != st.end))

        # non-UTF-8 screen for string columns: pyarrow's vectorized
        # validator in the common case; only on failure fall back to a
        # per-row scan to find the offenders and route them through the
        # per-record decoder for the canonical error. The validated
        # array is reused for the final output when nothing changes it.
        prebuilt: dict[int, pa.Array] = {}
        for ci, col in enumerate(cols):
            if isinstance(col, _BinCol) and col.is_str:
                try:
                    prebuilt[ci] = col.to_arrow(data)
                except pa.lib.ArrowInvalid:
                    st.bail_at(col.bad_utf8_rows(data))
        bailed = np.nonzero(st.fallback)[0]
        if len(bailed):
            for c in cols:
                if isinstance(c, _BinCol):
                    c.clear(bailed)
                else:
                    c.valid[bailed] = False

        # per-record fallback: value splice on success, error capture
        errors: dict[int, Exception] = {}
        fb_ok = np.zeros(n, dtype=bool)
        for i in bailed:
            i = int(i)
            raw = value_array[i].as_py()
            try:
                if confluent:
                    if len(raw) < 5 or raw[0]:
                        raise AvroDecodeError("not a Confluent-framed payload")
                    body = raw[5:]
                else:
                    body = raw
                rec = record_decode(bytes(body))
            except Exception as exc:  # noqa: BLE001 — never-throw serde
                errors[i] = exc
                continue
            fb_ok[i] = True
            for name, col in zip(names, cols):
                col.patch(i, rec[name])

        ok_valid = ~null_in & (~st.fallback | fb_ok)
        arrays = [
            prebuilt[ci]
            if ci in prebuilt and not len(bailed) and not cols[ci].patched
            else cols[ci].to_arrow(data)
            for ci in range(len(cols))
        ]
        ok = pa.StructArray.from_arrays(arrays, names=names, mask=pa.array(~ok_valid))
        return BatchDecodeResult(ok, errors)

    return decode


# ------------------------------------------------------------------ encoder
#
# The vectorized ENCODE twin: per-record Python becomes per-field
# numpy passes that compute every row's byte length, then scatter the
# bytes into one contiguous output buffer (the Arrow binary layout)
# with fancy-indexed writes. Varints write ≤10 masked passes (one per
# possible byte); strings/bytes gather straight from the input Arrow
# buffers; decimals (precision ≤ 18) shift out big-endian bytes from
# the decimal128 words. Rows the vectorized pass cannot encode
# (required-field null, >int64 decimal) are bailed to the compiled
# per-record encoder, mirroring the decoder's fallback contract.


class _EncSt:
    __slots__ = ("bail",)

    def __init__(self, n: int):
        self.bail = np.zeros(n, dtype=bool)


def _varint_lengths(u: np.ndarray) -> np.ndarray:
    """Byte count of each zigzag-encoded (uint64) varint value."""
    n = np.ones(len(u), dtype=np.int64)
    for k in range(1, 10):
        n += (u >= np.uint64(1 << (7 * k))).astype(np.int64)
    return n


def _write_varints(buf, dest, u, nbytes, act) -> None:
    """Write varint bytes of ``u`` at ``dest`` for rows in ``act``."""
    for k in range(10):
        sel = act & (nbytes > k)
        if not sel.any():
            break
        b = (u[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        more = (nbytes[sel] - 1) > k
        buf[dest[sel] + k] = (b | (more.astype(np.uint64) << np.uint64(7))).astype(
            np.uint8
        )


def _zigzag_u64(v: np.ndarray) -> np.ndarray:
    return ((v.astype(np.int64) << 1) ^ (v.astype(np.int64) >> 63)).astype(np.uint64)


def _arr_np_valid(arr: pa.Array):
    return arr.is_valid().to_numpy(zero_copy_only=False)


def _compile_field_encoder(sch: Any):
    """Compile to ``fn(arr, st, excluded) -> (lengths, write)``.

    ``excluded`` marks rows this field must not touch (record-null or
    union-null upstream); ``lengths`` is per-row byte count (garbage
    on excluded rows — the caller zeroes them); ``write(buf, dest,
    live)`` scatters bytes for rows in ``live`` (callers pass
    ``~record_null & ~st.bail`` evaluated at write time).
    """
    if isinstance(sch, list):
        if len(sch) != 2 or "null" not in sch:
            raise ValueError(f"unsupported union {sch!r}")
        null_idx = sch.index("null")
        child = _compile_field_encoder(sch[1 - null_idx])
        null_byte = np.uint8((null_idx << 1))
        val_byte = np.uint8(((1 - null_idx) << 1))

        def enc_union(arr, st, excluded):
            isnull = ~_arr_np_valid(arr)
            clen, cwrite = child(arr, st, excluded | isnull)
            lengths = 1 + np.where(isnull, 0, clen)

            def write(buf, dest, live):
                buf[dest[live]] = np.where(isnull[live], null_byte, val_byte)
                cwrite(buf, dest + 1, live & ~isnull)

            return lengths, write

        return enc_union

    if _is_decimal(sch):
        p, s = _capped_decimal(sch)
        if p > 18:
            raise ValueError("vectorized encoder covers decimal precision <= 18")

        def enc_decimal(arr, st, excluded):
            n = len(arr)
            st.bail |= ~excluded & ~_arr_np_valid(arr)  # required null
            bufs = arr.buffers()
            if bufs[1] is not None:
                words = np.frombuffer(bufs[1], dtype=np.int64)[
                    2 * arr.offset : 2 * (arr.offset + n)
                ].reshape(-1, 2)
                v, hi = words[:, 0].copy(), words[:, 1]
                st.bail |= ~excluded & (hi != (v >> 63))  # beyond int64
            else:
                v = np.zeros(n, dtype=np.int64)
            # byte-parity with the per-record encoder's
            # max(1, (bit_length + 8) // 8): |v| >= 2^(8k-1) adds a byte
            # (so -128 encodes as the same sign-extended 2 bytes)
            av = np.abs(v)
            nb = np.ones(n, dtype=np.int64)
            for k in range(1, 8):
                nb += (av >= (np.int64(1) << np.int64(8 * k - 1))).astype(np.int64)
            lengths = 1 + nb  # 1-byte varint length prefix + body

            def write(buf, dest, live):
                buf[dest[live]] = (nb[live] << 1).astype(np.uint8)  # zigzag(len)
                for j in range(8):
                    sel = live & (nb > j)
                    if not sel.any():
                        break
                    shift = (nb[sel] - 1 - j) * 8
                    buf[dest[sel] + 1 + j] = ((v[sel] >> shift) & 0xFF).astype(np.uint8)

            return lengths, write

        return enc_decimal

    t = _type_name(sch)
    if t in ("int", "long"):

        def enc_intlong(arr, st, excluded):
            st.bail |= ~excluded & ~_arr_np_valid(arr)
            # fill_null keeps the numpy dtype integral: a bare to_numpy on a
            # nullable int64 column with any null converts the WHOLE column to
            # float64, silently rounding valid values above 2^53 (epoch-nanos,
            # snowflake ids) before varint encoding. Null rows themselves are
            # excluded/bailed, so the 0 filler is never written.
            v = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            u = _zigzag_u64(v)
            nb = _varint_lengths(u)

            def write(buf, dest, live):
                _write_varints(buf, dest, u, nb, live)

            return nb, write

        return enc_intlong

    if t == "boolean":

        def enc_bool(arr, st, excluded):
            st.bail |= ~excluded & ~_arr_np_valid(arr)
            v = arr.fill_null(False).to_numpy(zero_copy_only=False)

            def write(buf, dest, live):
                buf[dest[live]] = (v[live] != 0).astype(np.uint8)

            return np.ones(len(arr), dtype=np.int64), write

        return enc_bool

    if t in ("float", "double"):
        width = 4 if t == "float" else 8
        dt = np.dtype("<f4") if t == "float" else np.dtype("<f8")

        def enc_fp(arr, st, excluded, _w=width, _dt=dt):
            st.bail |= ~excluded & ~_arr_np_valid(arr)
            # null positions surface as NaN here, but null rows are never
            # written (excluded by the union wrapper or bailed above), so
            # genuine NaN values pass through untouched
            v = arr.to_numpy(zero_copy_only=False).astype(_dt)
            vb = v.view(np.uint8).reshape(-1, _w)

            def write(buf, dest, live):
                for j in range(_w):
                    buf[dest[live] + j] = vb[live, j]

            return np.full(len(arr), _w, dtype=np.int64), write

        return enc_fp

    if t in ("bytes", "string"):

        def enc_bytes(arr, st, excluded):
            n = len(arr)
            st.bail |= ~excluded & ~_arr_np_valid(arr)
            bufs = arr.buffers()
            odt = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
            offs = (
                np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + n + 1].astype(np.int64)
                if bufs[1] is not None
                else np.zeros(n + 1, dtype=np.int64)
            )
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.empty(0, dtype=np.uint8)
            )
            starts, blen = offs[:-1], offs[1:] - offs[:-1]
            u = _zigzag_u64(blen)
            nb = _varint_lengths(u)

            def write(buf, dest, live):
                _write_varints(buf, dest, u, nb, live)
                total = int(blen[live].sum())
                if total:
                    src = np.repeat(starts[live], blen[live]) + _within(blen[live], total)
                    dst = np.repeat(dest[live] + nb[live], blen[live]) + _within(
                        blen[live], total
                    )
                    buf[dst] = data[src]

            return nb + blen, write

        return enc_bytes

    raise ValueError(f"unsupported avro type {sch!r}")


def _within(lens: np.ndarray, total: int) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] — per-chunk positions for gathers."""
    pref = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(pref, lens)


def patch_binary(arr: pa.Array, patched: dict[int, bytes]) -> pa.Array:
    """Rebuild a Binary array with ``patched`` rows replaced (rows
    become valid) — vectorized segment copies between the (few)
    patch points, the same splice the decoder's fallback uses."""
    n = len(arr)
    valid = arr.is_valid().to_numpy(zero_copy_only=False).copy()
    bufs = arr.buffers()
    offs = (
        np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + n + 1].astype(
            np.int64
        )
        if bufs[1] is not None
        else np.zeros(n + 1, dtype=np.int64)
    )
    values = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    lens = offs[1:] - offs[:-1]
    new_lens = lens.copy()
    for i, b in patched.items():
        new_lens[i] = len(b)
        valid[i] = True
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    out = np.empty(int(new_offs[-1]), dtype=np.uint8)
    for i, b in patched.items():
        out[new_offs[i] : new_offs[i] + len(b)] = np.frombuffer(b, dtype=np.uint8)
    prev = 0
    for i in sorted(patched) + [n]:
        if i > prev:
            s0, s1 = offs[prev], offs[i]
            out[new_offs[prev] : new_offs[prev] + (s1 - s0)] = values[s0:s1]
        prev = i + 1
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [
            _validity(valid),
            pa.py_buffer(np.ascontiguousarray(new_offs.astype(np.int32)).tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
    )


def compile_batch_encoder(schema: dict):
    """Compile ``schema`` into ``fn(struct_array, prefix) -> pa.BinaryArray``.

    ``struct_array`` holds the records (null rows → null output);
    ``prefix`` (e.g. the 5-byte Confluent frame) is prepended to every
    encoded value. Rows the vectorized pass cannot encode fall back to
    the compiled per-record encoder; a record that ALSO fails there
    (e.g. null for a required field) encodes as EMPTY bytes — the
    never-throw serializer contract
    (serdes/VavrSafeSerializer.java:26-52).

    Raises ``ValueError`` at compile time for schema features outside
    the vectorizable subset, so callers fall back wholesale.
    """
    field_comps = [_compile_field_encoder(f["type"]) for f in schema["fields"]]
    record_encode = compile_record_encoder(schema)

    def encode(struct_array: pa.Array, prefix: bytes = b"") -> pa.BinaryArray:
        if isinstance(struct_array, pa.ChunkedArray):
            struct_array = struct_array.combine_chunks()
        n = len(struct_array)
        row_null = ~struct_array.is_valid().to_numpy(zero_copy_only=False)
        st = _EncSt(n)
        pairs = []
        for i, comp in enumerate(field_comps):
            pairs.append(comp(struct_array.field(i), st, row_null | st.bail))
        L = np.vstack([p[0] for p in pairs]) if pairs else np.zeros((0, n), np.int64)
        dead = row_null | st.bail
        L[:, dead] = 0
        plen = len(prefix)
        row_total = np.where(dead, 0, L.sum(axis=0) + plen)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(row_total, out=offs[1:])
        buf = np.zeros(int(offs[-1]), dtype=np.uint8)
        live = ~dead
        if plen and live.any():
            k = int(live.sum())
            pidx = np.repeat(offs[:-1][live], plen) + np.tile(
                np.arange(plen, dtype=np.int64), k
            )
            buf[pidx] = np.tile(np.frombuffer(prefix, dtype=np.uint8), k)
        dest = offs[:-1] + plen
        for (lengths, write), row in zip(pairs, L):
            write(buf, dest, live)
            dest = dest + row
        out_offs = offs
        values = buf
        bailed = np.nonzero(st.bail & ~row_null)[0]
        if len(bailed):
            # splice per-record encodes (or empty bytes) into the buffer
            patched: dict[int, bytes] = {}
            for i in bailed:
                i = int(i)
                try:
                    patched[i] = prefix + record_encode(struct_array[i].as_py())
                except Exception:  # noqa: BLE001 — never-throw serializer
                    patched[i] = b""
            extra = np.zeros(n, dtype=np.int64)
            for i, b in patched.items():
                extra[i] = len(b)
            lens = out_offs[1:] - out_offs[:-1]
            new_offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens + extra, out=new_offs[1:])
            out = np.empty(int(new_offs[-1]), dtype=np.uint8)
            for i, b in patched.items():
                out[new_offs[i] : new_offs[i] + len(b)] = np.frombuffer(b, dtype=np.uint8)
            prev = 0
            for i in sorted(patched) + [n]:
                if i > prev:
                    s0, s1 = out_offs[prev], out_offs[i]
                    out[new_offs[prev] : new_offs[prev] + (s1 - s0)] = values[s0:s1]
                prev = i + 1
            values, out_offs = out, new_offs
        if int(out_offs[-1]) >= 2**31:
            raise AvroDecodeError(
                "batch encoded payload exceeds 2 GiB; lower "
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        return pa.Array.from_buffers(
            pa.binary(),
            n,
            [
                _validity(~row_null),
                pa.py_buffer(np.ascontiguousarray(out_offs.astype(np.int32)).tobytes()),
                pa.py_buffer(values.tobytes()),
            ],
        )

    return encode
