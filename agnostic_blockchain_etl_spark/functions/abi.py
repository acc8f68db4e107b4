"""EVM ABI encode/decode kernels (pure Python, from the public ABI spec).

Reference capability: the ClickHouse executable UDFs ``evm_decode_event``
and ``evm_decode_call`` used by the decode pipelines
(/root/reference/examples/ethereum_decoded_logs/create_buffer.sql:26-31,
/root/reference/examples/ethereum_decoded_traces/create_buffer.sql:32-39)
and the ``ethereum_rpc_call`` helper's signature syntax
(/root/reference/examples/ethereum_token_erc20_balances/create_buffer.sql:42
``'function symbol()(string)'``).

Observed output contract (from template JSON paths):

    evm_decode_event(topics, data, fullsigs)
        -> '{"value": {"signature": "Transfer(address,address,uint256)",
                        "inputs": {"arg0": "0x…", "arg1": "0x…", "arg2": 123}},
             "error": null}'
    evm_decode_call(input, output, fullsigs)
        -> '{"value": {"signature": "…", "inputs": {…}, "outputs": {…}},
             "error": "…"}'

Inputs/outputs are keyed positionally ``arg0..argN``
(create_buffer.sql:31 ``evt.value.inputs.arg0``). Values serialize as:
addresses / bytes → ``0x`` hex strings, integers → JSON numbers (Python
big-int JSON is exact), bool → true/false, arrays → lists, tuples → nested
``{"arg0": …}`` objects.

Signature grammar accepted (superset of what the examples use):
- ``event Transfer(address indexed from, address indexed, uint256)``
- ``Transfer(address,address,uint256)`` (bare)
- ``function balanceOf(address)(uint256)`` (inputs)(outputs)
"""

from __future__ import annotations

import functools
import json
import re
from dataclasses import dataclass, field

from .keccak import keccak256

_WORD = 32


class AbiError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Type model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AbiType:
    """A parsed ABI type: elementary, fixed/dynamic array, or tuple."""

    base: str                      # 'uint', 'int', 'address', 'bool', 'bytes', 'string', 'tuple'
    bits: int = 0                  # for uint/int
    fixed_size: int = 0            # for bytesN
    array_dims: tuple = ()         # outermost-last; -1 = dynamic dim
    components: tuple = ()         # for tuple

    @property
    def is_array(self) -> bool:
        return bool(self.array_dims)

    @property
    def is_dynamic(self) -> bool:
        if self.array_dims:
            if self.array_dims[-1] == -1:
                return True
            return self.element_type().is_dynamic
        if self.base in ("bytes", "string"):
            return True
        if self.base == "tuple":
            return any(c.is_dynamic for c in self.components)
        return False

    def element_type(self) -> "AbiType":
        return AbiType(self.base, self.bits, self.fixed_size,
                       self.array_dims[:-1], self.components)

    def canonical(self) -> str:
        if self.array_dims:
            inner = self.element_type().canonical()
            d = self.array_dims[-1]
            return f"{inner}[]" if d == -1 else f"{inner}[{d}]"
        if self.base == "uint":
            return f"uint{self.bits}"
        if self.base == "int":
            return f"int{self.bits}"
        if self.base == "bytes" and self.fixed_size:
            return f"bytes{self.fixed_size}"
        if self.base == "tuple":
            return "(" + ",".join(c.canonical() for c in self.components) + ")"
        return self.base

    def head_size(self) -> int:
        """Size of this type's head slot in bytes."""
        if self.is_dynamic:
            return _WORD
        if self.array_dims:
            return self.array_dims[-1] * self.element_type().head_size()
        if self.base == "tuple":
            return sum(c.head_size() for c in self.components)
        return _WORD


_ELEMENTARY_RE = re.compile(
    r"^(?:(uint|int)(\d+)?|(bytes)(\d+)?|(address|bool|string))$"
)


def parse_type(s: str) -> AbiType:
    """Parse a canonical-ish ABI type string, incl. arrays and tuples."""
    s = s.strip()
    # peel array suffixes from the right
    dims: list[int] = []
    while s.endswith("]"):
        lb = s.rfind("[")
        if lb < 0:
            raise AbiError(f"malformed type {s!r}")
        dim = s[lb + 1:-1].strip()
        dims.insert(0, -1 if dim == "" else int(dim))
        s = s[:lb].strip()
    if s.startswith("("):
        if not s.endswith(")"):
            raise AbiError(f"malformed tuple type {s!r}")
        comps = tuple(parse_type(p) for p in _split_params(s[1:-1]))
        return AbiType("tuple", components=comps, array_dims=tuple(dims))
    m = _ELEMENTARY_RE.match(s)
    if not m:
        raise AbiError(f"unknown ABI type {s!r}")
    if m.group(1):  # uint/int
        bits = int(m.group(2)) if m.group(2) else 256
        if bits % 8 or not 8 <= bits <= 256:
            raise AbiError(f"bad integer width in {s!r}")
        return AbiType(m.group(1), bits=bits, array_dims=tuple(dims))
    if m.group(3):  # bytes / bytesN
        n = int(m.group(4)) if m.group(4) else 0
        if n and not 1 <= n <= 32:
            raise AbiError(f"bad bytesN width in {s!r}")
        return AbiType("bytes", fixed_size=n, array_dims=tuple(dims))
    return AbiType(m.group(5), array_dims=tuple(dims))


def _split_params(s: str) -> list[str]:
    """Split a parameter list on top-level commas (paren/bracket aware)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur or parts:
        tail = "".join(cur).strip()
        if tail:
            parts.append(tail)
    return [p for p in (q.strip() for q in parts) if p]


# ---------------------------------------------------------------------------
# Signature model
# ---------------------------------------------------------------------------

@dataclass
class Param:
    type: AbiType
    indexed: bool = False
    name: str = ""


@dataclass
class Signature:
    kind: str                    # 'event' | 'function'
    name: str
    inputs: list[Param] = field(default_factory=list)
    outputs: list[Param] = field(default_factory=list)

    def canonical(self) -> str:
        return self.name + "(" + ",".join(p.type.canonical() for p in self.inputs) + ")"

    def topic0(self) -> bytes:
        return keccak256(self.canonical())

    def selector(self) -> bytes:
        return keccak256(self.canonical())[:4]


_SIG_RE = re.compile(
    r"^\s*(?:(event|function)\s+)?([A-Za-z_$][A-Za-z0-9_$]*)\s*\((.*?)\)\s*(?:\((.*?)\)|returns\s*\((.*?)\))?\s*$",
    re.S,
)


def _parse_param(s: str, allow_indexed: bool) -> Param:
    toks = s.strip()
    indexed = False
    name = ""
    # strip a trailing name and/or 'indexed'/location keywords:
    # "<type> [indexed|memory|calldata|storage] [name]" — the type may
    # itself contain spaces only inside tuple parens (handled by
    # scanning from the right for bare identifiers).
    t = toks
    while True:
        t = t.strip()
        m = re.search(r"\s+([A-Za-z_$][A-Za-z0-9_$]*)$", t)
        if not m:
            break
        w = m.group(1)
        if w == "indexed":
            if not allow_indexed:
                raise AbiError(f"'indexed' not allowed in {s!r}")
            indexed = True
        elif w in ("memory", "calldata", "storage"):
            pass  # solidity location keywords — irrelevant to ABI layout
        else:
            name = w
        t = t[: m.start()]
        if name:
            # only one trailing name allowed; keep stripping 'indexed'
            # and location keywords sitting between type and name —
            # "bytes memory data" is normal Solidity (review finding:
            # the old code checked only for 'indexed' here, so the
            # location keyword stayed glued to the type and raised
            # unknown-ABI-type)
            while True:
                m2 = re.search(r"\s+(indexed|memory|calldata|storage)$", t)
                if not m2:
                    break
                if m2.group(1) == "indexed":
                    if not allow_indexed:
                        raise AbiError(f"'indexed' not allowed in {s!r}")
                    indexed = True
                t = t[: m2.start()]
            break
    return Param(parse_type(t), indexed=indexed, name=name)


def parse_signature(sig: str) -> Signature:
    """Parse a human-readable event/function signature."""
    m = _SIG_RE.match(sig)
    if not m:
        raise AbiError(f"malformed signature {sig!r}")
    kind, name, ins, outs1, outs2 = m.groups()
    kind = kind or "event"
    outs = outs1 if outs1 is not None else outs2
    inputs = [_parse_param(p, allow_indexed=(kind == "event"))
              for p in _split_params(ins or "")]
    outputs = [_parse_param(p, allow_indexed=False)
               for p in _split_params(outs or "")] if outs else []
    return Signature(kind, name, inputs, outputs)


@functools.lru_cache(maxsize=4096)
def _sig_topic0_cached(sig_s: str) -> "tuple[Signature, bytes]":
    """Per-process memo of (parsed signature, topic0) for the per-ROW
    decode paths: `evm_decode_event` used to re-parse every candidate
    signature and re-keccak its canonical form for EVERY log row — the
    guide-§4.5 init-once class of cost (a pandas-UDF batch of 10k rows
    paid 10k parses + 10k pure-Python keccaks per candidate). The
    candidate set of any real workload is a handful of ABI strings, so
    the cache is effectively a per-worker constant table. Decode paths
    only READ the Signature, so sharing one instance is safe; the
    public `parse_signature` contract (a fresh, caller-mutable object)
    is unchanged."""
    s = parse_signature(sig_s)
    return s, s.topic0()


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------

def _read_word(data: bytes, off: int) -> bytes:
    w = data[off:off + _WORD]
    if len(w) < _WORD:
        raise AbiError(f"truncated word at offset {off}")
    return w


def _decode_value(t: AbiType, data: bytes, off: int):
    """Decode one value of type ``t`` whose head starts at ``off``."""
    if t.is_array:
        d = t.array_dims[-1]
        el = t.element_type()
        if d == -1:
            # dynamic types reach decoding ONLY through _decode_at
            # (their head slot holds a pointer RELATIVE to the
            # enclosing sequence base, which this function does not
            # know — the removed inline branch here read it as
            # absolute and would mis-decode nested dynamics)
            raise AbiError("internal: dynamic array must decode via "
                           "_decode_at")
        return _decode_sequence([el] * d, data, off, inline=True)
    if t.base == "tuple":
        return _decode_sequence(list(t.components), data, off, inline=True)
    if t.base == "string" or (t.base == "bytes" and not t.fixed_size):
        raise AbiError(f"internal: dynamic {t.base} must decode via "
                       "_decode_at")
    word = _read_word(data, off)
    return _decode_word(t, word)


def _decode_word(t: AbiType, word: bytes):
    """Decode a static 32-byte word into a Python value."""
    if t.base == "uint":
        return int.from_bytes(word, "big")
    if t.base == "int":
        v = int.from_bytes(word, "big")
        if v >= 1 << 255:
            v -= 1 << 256
        return v
    if t.base == "address":
        return "0x" + word[-20:].hex()
    if t.base == "bool":
        return int.from_bytes(word, "big") != 0
    if t.base == "bytes" and t.fixed_size:
        return "0x" + word[: t.fixed_size].hex()
    raise AbiError(f"cannot word-decode type {t.canonical()}")


def _decode_sequence(types: list[AbiType], data: bytes, base: int,
                     inline: bool = False):
    """Decode a head-sequence of ``types`` starting at absolute offset
    ``base``. Dynamic members' pointers are relative to ``base``."""
    if inline:
        # static inline sequence inside another head — but if any member is
        # dynamic, the enclosing head held a pointer: caller passes base at
        # the pointed-to location already resolved by _decode_value for
        # arrays; for dynamic tuples we must resolve here.
        pass
    out = []
    off = base
    for t in types:
        if t.is_dynamic:
            ptr = int.from_bytes(_read_word(data, off), "big")
            out.append(_decode_at(t, data, base + ptr))
            off += _WORD
        else:
            out.append(_decode_value(t, data, off))
            off += t.head_size()
    return out


def _decode_at(t: AbiType, data: bytes, loc: int):
    """Decode a dynamic value whose body starts at absolute ``loc``."""
    if t.is_array and t.array_dims[-1] == -1:
        n = int.from_bytes(_read_word(data, loc), "big")
        if n * _WORD > len(data):
            raise AbiError("array length exceeds payload")
        return _decode_sequence([t.element_type()] * n, data, loc + _WORD)
    if t.is_array:  # fixed array of dynamic elements
        return _decode_sequence([t.element_type()] * t.array_dims[-1], data, loc)
    if t.base == "tuple":
        return _decode_sequence(list(t.components), data, loc)
    if t.base == "string":
        n = int.from_bytes(_read_word(data, loc), "big")
        raw = data[loc + _WORD: loc + _WORD + n]
        if len(raw) < n:
            raise AbiError("truncated string")
        return raw.decode("utf-8", errors="replace")
    if t.base == "bytes":
        n = int.from_bytes(_read_word(data, loc), "big")
        raw = data[loc + _WORD: loc + _WORD + n]
        if len(raw) < n:
            raise AbiError("truncated bytes")
        return "0x" + raw.hex()
    raise AbiError(f"not a dynamic type: {t.canonical()}")


def abi_decode(types: list[AbiType], data: bytes) -> list:
    """Decode an ABI-encoded head sequence (function args / return data)."""
    return _decode_sequence(types, data, 0)


# ---------------------------------------------------------------------------
# Encoding (needed to build eth_call data for ethereum_rpc_call)
# ---------------------------------------------------------------------------

def _encode_word(t: AbiType, v) -> bytes:
    if t.base == "uint":
        n = int(v, 16) if isinstance(v, str) and v.startswith("0x") else int(v)
        if n < 0 or n >= 1 << t.bits:
            raise AbiError(f"{v!r} out of range for {t.canonical()}")
        return n.to_bytes(_WORD, "big")
    if t.base == "int":
        n = int(v)
        if not -(1 << (t.bits - 1)) <= n < 1 << (t.bits - 1):
            raise AbiError(f"{v!r} out of range for {t.canonical()}")
        return (n & ((1 << 256) - 1)).to_bytes(_WORD, "big")
    if t.base == "address":
        raw = bytes.fromhex(v[2:] if isinstance(v, str) and v.startswith("0x") else v) \
            if isinstance(v, str) else bytes(v)
        if len(raw) != 20:
            raise AbiError(f"address must be 20 bytes, got {len(raw)}")
        return raw.rjust(_WORD, b"\x00")
    if t.base == "bool":
        return (1 if v else 0).to_bytes(_WORD, "big")
    if t.base == "bytes" and t.fixed_size:
        raw = bytes.fromhex(v[2:]) if isinstance(v, str) else bytes(v)
        if len(raw) != t.fixed_size:
            raise AbiError(f"bytes{t.fixed_size} needs exactly {t.fixed_size} bytes")
        return raw.ljust(_WORD, b"\x00")
    raise AbiError(f"cannot word-encode {t.canonical()}")


def _encode_dynamic(t: AbiType, v) -> bytes:
    if t.base == "string":
        raw = v.encode("utf-8")
    elif t.base == "bytes":
        raw = bytes.fromhex(v[2:]) if isinstance(v, str) and v.startswith("0x") else (
            v if isinstance(v, bytes) else bytes.fromhex(v))
    else:
        raise AbiError(f"not dynamic-encodable: {t.canonical()}")
    pad = (-len(raw)) % _WORD
    return len(raw).to_bytes(_WORD, "big") + raw + b"\x00" * pad


def abi_encode(types: list[AbiType], values: list) -> bytes:
    """ABI-encode a head sequence of ``values`` (supports the subset used by
    eth_call argument building: elementary types, dynamic bytes/string,
    dynamic arrays of static types)."""
    if len(types) != len(values):
        raise AbiError(f"arity mismatch: {len(types)} types, {len(values)} values")
    heads: list[bytes] = []
    tails: list[bytes] = []
    head_size = sum(t.head_size() for t in types)
    tail_off = head_size
    for t, v in zip(types, values):
        if t.is_dynamic:
            if t.is_array and t.array_dims[-1] == -1:
                el = t.element_type()
                body = len(v).to_bytes(_WORD, "big") + abi_encode([el] * len(v), list(v))
            elif t.base in ("string", "bytes"):
                body = _encode_dynamic(t, v)
            else:
                raise AbiError(f"encoding of dynamic {t.canonical()} unsupported")
            heads.append(tail_off.to_bytes(_WORD, "big"))
            tails.append(body)
            tail_off += len(body)
        elif t.is_array:
            el = t.element_type()
            heads.append(abi_encode([el] * t.array_dims[-1], list(v)))
        elif t.base == "tuple":
            heads.append(abi_encode(list(t.components), list(v)))
        else:
            heads.append(_encode_word(t, v))
    return b"".join(heads) + b"".join(tails)


# ---------------------------------------------------------------------------
# Public UDF kernels
# ---------------------------------------------------------------------------

def _args_object(params: list[Param], values: list) -> dict:
    return {f"arg{i}": v for i, v in enumerate(values)}


def _as_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return bytes.fromhex(v[2:]) if v.startswith("0x") else v.encode("latin-1")
    raise AbiError(f"expected bytes-like, got {type(v).__name__}")


def evm_decode_event(topics, data, fullsigs) -> str:
    """Decode a log against candidate event signatures → JSON string.

    ``topics``: list of 32-byte values (bytes or 0x-hex str); ``data``:
    bytes/hex; ``fullsigs``: candidate signature strings. The first
    candidate whose topic0 matches and decodes cleanly wins.
    """
    try:
        tps = [_as_bytes(t) for t in (topics or [])]
        payload = _as_bytes(data)
        if not tps:
            return json.dumps({"value": None, "error": "no topics"})
        errors = []
        for sig_s in (fullsigs or []):
            try:
                sig, t0 = _sig_topic0_cached(sig_s)
                if sig.kind != "event":
                    continue
                if t0 != tps[0]:
                    errors.append(f"{sig.canonical()}: topic0 mismatch")
                    continue
                indexed = [p for p in sig.inputs if p.indexed]
                unindexed = [p for p in sig.inputs if not p.indexed]
                if len(indexed) != len(tps) - 1:
                    errors.append(
                        f"{sig.canonical()}: {len(indexed)} indexed params, "
                        f"{len(tps) - 1} topics")
                    continue
                values: list = [None] * len(sig.inputs)
                ti = 1
                for i, p in enumerate(sig.inputs):
                    if p.indexed:
                        if p.type.is_dynamic:
                            # dynamic indexed params are stored as their hash
                            values[i] = "0x" + tps[ti].hex()
                        else:
                            values[i] = _decode_word(p.type, tps[ti])
                        ti += 1
                body = abi_decode([p.type for p in unindexed], payload)
                bi = iter(body)
                for i, p in enumerate(sig.inputs):
                    if not p.indexed:
                        values[i] = next(bi)
                return json.dumps({
                    "value": {"signature": sig.canonical(),
                              "inputs": _args_object(sig.inputs, values)},
                    "error": None,
                })
            except AbiError as e:
                errors.append(str(e))
        return json.dumps({"value": None,
                           "error": "; ".join(errors) or "no candidate signatures"})
    except Exception as e:  # never raise out of the UDF
        return json.dumps({"value": None, "error": f"{type(e).__name__}: {e}"})


def evm_decode_call(input_data, output_data, fullsigs) -> str:
    """Decode a call's input (+ optional output) against candidate function
    signatures → JSON string (see module docstring for the contract)."""
    try:
        inp = _as_bytes(input_data)
        out = _as_bytes(output_data)
        if len(inp) < 4:
            return json.dumps({"value": None, "error": "input shorter than selector"})
        errors = []
        for sig_s in (fullsigs or []):
            try:
                sig, t0 = _sig_topic0_cached(sig_s)
                if sig.kind != "function":
                    # bare signatures default to 'event'; accept them as calls
                    sig = Signature("function", sig.name, sig.inputs, sig.outputs)
                # selector = keccak(canonical)[:4]; canonical() ignores
                # kind, so the cached topic0 prefix IS the selector
                if t0[:4] != inp[:4]:
                    errors.append(f"{sig.canonical()}: selector mismatch")
                    continue
                in_vals = abi_decode([p.type for p in sig.inputs], inp[4:])
                result = {"signature": sig.canonical(),
                          "inputs": _args_object(sig.inputs, in_vals)}
                if sig.outputs:
                    if out:
                        out_vals = abi_decode([p.type for p in sig.outputs], out)
                        result["outputs"] = _args_object(sig.outputs, out_vals)
                    else:
                        result["outputs"] = None
                return json.dumps({"value": result, "error": None})
            except AbiError as e:
                errors.append(str(e))
        return json.dumps({"value": None,
                           "error": "; ".join(errors) or "no candidate signatures"})
    except Exception as e:
        return json.dumps({"value": None, "error": f"{type(e).__name__}: {e}"})


def encode_call_data(func_sig: str, args: list) -> bytes:
    """Build eth_call data: 4-byte selector + ABI-encoded args.

    ``func_sig`` uses the reference's syntax, e.g.
    ``'function balanceOf(address)(uint256)'``."""
    sig = parse_signature(func_sig)
    return sig.selector() + abi_encode([p.type for p in sig.inputs], args)


def decode_call_result(func_sig: str, data: bytes) -> dict:
    """Decode eth_call return data into ``{"arg0": …}`` per the output types."""
    sig = parse_signature(func_sig)
    vals = abi_decode([p.type for p in sig.outputs], data)
    return _args_object(sig.outputs, vals)
