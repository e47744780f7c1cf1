"""Kaldi BINARY nnet3 model files (.mdl / .raw) — standalone read/write.

The reference imports trained models by shelling out to a full Kaldi
install (`nnet3-copy --binary=false final.mdl -`, weight_loader.go:605-613)
and parsing the text.  Here the binary container is handled directly, so
a real `final.mdl` loads with no Kaldi installed.

Layout of a binary .mdl (kaldi/src/nnet3/nnet-nnet.cc Nnet::Write,
hmm/transition-model.cc):

    \\0B                                   binary header
    <TransitionModel> ... </TransitionModel>   (absent in .raw files)
    <Nnet3> \\n
    <text config lines: input-node/component-node/output-node...> \\n
    \\n                                    blank line ends the config
    <NumComponents> [int32]
    <ComponentName> [name] <ClassName> ...component data... </ClassName>
      (x NumComponents)
    </Nnet3>

Notes on fidelity:
  * Token/basic-type/FV/FM primitives follow Kaldi io-funcs exactly
    (size-prefixed scalars, 'T'/'F' bools, float32 "FV"/"FM" and float64
    "DV"/"DM" markers) — the same grammar the cegs parser (io/kaldi_io.py)
    decodes byte-exactly against real ark files.
  * The TransitionModel block is preserved OPAQUELY (byte-for-byte) and
    round-trips unchanged; decoding its tuples into a transition-id ->
    pdf-id map is not attempted (the chain pipeline needs only the nnet).
  * Component payloads are parsed with a tag-driven reader: matrix/vector
    markers are self-describing; sized scalars are typed by the same tag
    tables the text loader uses (models/kaldi_loader.py), with a
    float-plausibility heuristic for unknown tags, so foreign components
    are skipped structurally rather than crashing the load.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter


# tags whose payload is WriteBasicType<bool> ('T'/'F', no size byte)
_BOOL_TAGS = {
    "<IsGradient>", "<UseNaturalGradient>", "<IsUpdatable>", "<TestMode>",
}

# int-valued tags (4-byte payloads that must NOT be read as float)
_INT_TAGS = {
    "<Dim>", "<InputDim>", "<OutputDim>", "<BlockDim>", "<NumFiltersIn>",
    "<NumFiltersOut>", "<HeightIn>", "<HeightOut>", "<NumHeads>",
    "<KeyDim>", "<ValueDim>", "<RankIn>", "<RankOut>", "<Rank>",
    "<UpdatePeriod>", "<NumSamplesHistory>", "<NumRepeats>", "<NumBlocks>",
}


@dataclass
class BinaryComponent:
    """One parsed component: class name + tag payloads in read order."""
    name: str = ""
    type: str = ""                       # class token without <>
    scalars: Dict[str, float] = field(default_factory=dict)
    ints: Dict[str, int] = field(default_factory=dict)
    bools: Dict[str, bool] = field(default_factory=dict)
    matrices: Dict[str, np.ndarray] = field(default_factory=dict)
    vectors: Dict[str, np.ndarray] = field(default_factory=dict)
    flags: List[str] = field(default_factory=list)   # value-less tags


@dataclass
class Nnet3Model:
    config_lines: List[str]
    components: List[BinaryComponent]
    transition_model: Optional[bytes] = None   # opaque, round-trips

    def component(self, name: str) -> BinaryComponent:
        for c in self.components:
            if c.name == name:
                return c
        raise KeyError(name)


# ---------------------------------------------------------------------------
# primitives on top of BinaryReader
# ---------------------------------------------------------------------------

def _skip_ws(r: BinaryReader) -> None:
    while True:
        b = r.peek_byte()
        if b is None or b not in (0x20, 0x0A, 0x0D, 0x09):
            return
        r.read_byte()


def _read_token(r: BinaryReader) -> str:
    _skip_ws(r)
    return r.read_token()


def _peek_marker(r: BinaryReader, n: int = 3) -> bytes:
    """Peek up to n bytes without consuming."""
    out = []
    got = []
    for _ in range(n):
        b = r.try_read_byte()
        if b is None:
            break
        got.append(b)
    for b in reversed(got):
        r.unread_byte(b)
    return bytes(got)


def _read_vector(r: BinaryReader, double: bool) -> np.ndarray:
    n = r.read_basic_int()
    raw = r.read_bytes(n * (8 if double else 4))
    a = np.frombuffer(raw, dtype=np.float64 if double else np.float32)
    return a.astype(np.float32)


def _read_matrix(r: BinaryReader, double: bool) -> np.ndarray:
    rows = r.read_basic_int()
    cols = r.read_basic_int()
    raw = r.read_bytes(rows * cols * (8 if double else 4))
    a = np.frombuffer(raw, dtype=np.float64 if double else np.float32)
    return a.astype(np.float32).reshape(rows, cols)


def _plausible_float(raw4: bytes) -> bool:
    f = struct.unpack("<f", raw4)[0]
    if f == 0.0:
        return True
    a = abs(f)
    return np.isfinite(f) and 1e-20 < a < 1e20


# ---------------------------------------------------------------------------
# component reader (generic, tag-driven)
# ---------------------------------------------------------------------------

def read_component(r: BinaryReader) -> BinaryComponent:
    """Reads `<ClassName> ...tags/data... </ClassName>` generically."""
    cls = _read_token(r)
    if not (cls.startswith("<") and cls.endswith(">")):
        raise ValueError(f"expected component class token, got {cls!r}")
    comp = BinaryComponent(type=cls[1:-1])
    end = f"</{cls[1:-1]}>"
    pending: Optional[str] = None     # last tag awaiting a value
    while True:
        _skip_ws(r)
        mk = _peek_marker(r, 3)
        if not mk:
            raise ValueError(f"EOF inside component {comp.type}")
        if mk[:1] == b"<":
            tok = _read_token(r)
            if tok == end:
                if pending is not None:
                    comp.flags.append(pending)
                return comp
            if pending is not None:
                comp.flags.append(pending)
            pending = tok
            continue
        # value for the pending tag
        if mk[:3] in (b"FV ", b"FM ", b"DV ", b"DM "):
            tok = _read_token(r)
            double = tok[0] == "D"
            if tok[1] == "V":
                val = _read_vector(r, double)
                comp.vectors[pending or f"_v{len(comp.vectors)}"] = val
            else:
                val = _read_matrix(r, double)
                comp.matrices[pending or f"_m{len(comp.matrices)}"] = val
            pending = None
            continue
        if mk[:1] in (b"T", b"F") and pending in _BOOL_TAGS:
            comp.bools[pending] = r.read_byte() == ord("T")
            pending = None
            continue
        if mk[:1] == b"\x04":
            r.read_byte()
            raw4 = r.read_bytes(4)
            if pending in _INT_TAGS:
                comp.ints[pending] = struct.unpack("<i", raw4)[0]
            elif pending is not None and (not _plausible_float(raw4)
                                          and "<" not in pending):
                comp.ints[pending] = struct.unpack("<i", raw4)[0]
            else:
                comp.scalars[pending or f"_s{len(comp.scalars)}"] = (
                    struct.unpack("<f", raw4)[0])
            pending = None
            continue
        if mk[:1] == b"\x08":
            r.read_byte()
            comp.scalars[pending or f"_s{len(comp.scalars)}"] = (
                struct.unpack("<d", r.read_bytes(8))[0])
            pending = None
            continue
        if mk[:1] in (b"T", b"F"):
            comp.bools[pending or f"_b{len(comp.bools)}"] = (
                r.read_byte() == ord("T"))
            pending = None
            continue
        raise ValueError(
            f"unrecognized payload {mk!r} after tag {pending!r} "
            f"in {comp.type}")


def write_component(w: BinaryWriter, comp: BinaryComponent) -> None:
    """Inverse of read_component: emits tags in a canonical order
    (ints, scalars, bools, vectors, matrices, flags)."""
    w.write_token(f"<{comp.type}>")
    for tag, v in comp.ints.items():
        w.write_token(tag)
        w.write_byte(4)
        w.write_bytes(struct.pack("<i", v))
    for tag, v in comp.scalars.items():
        w.write_token(tag)
        w.write_byte(4)
        w.write_bytes(struct.pack("<f", v))
    for tag, v in comp.bools.items():
        w.write_token(tag)
        w.write_bytes(b"T" if v else b"F")
    for tag, v in comp.vectors.items():
        w.write_token(tag)
        w.write_token("FV")
        w.write_byte(4)
        w.write_bytes(struct.pack("<i", len(v)))
        w.write_bytes(np.ascontiguousarray(v, np.float32).tobytes())
    for tag, v in comp.matrices.items():
        w.write_token(tag)
        w.write_token("FM")
        w.write_byte(4)
        w.write_bytes(struct.pack("<i", v.shape[0]))
        w.write_byte(4)
        w.write_bytes(struct.pack("<i", v.shape[1]))
        w.write_bytes(np.ascontiguousarray(v, np.float32).tobytes())
    for tag in comp.flags:
        w.write_token(tag)
    w.write_token(f"</{comp.type}>")


# ---------------------------------------------------------------------------
# whole-file read/write
# ---------------------------------------------------------------------------

def _scan_past(r: BinaryReader, needle: bytes) -> bytes:
    """Consume bytes up to and including `needle`, returning them.  Used to
    keep the TransitionModel opaque: the end token's 18 ASCII bytes
    appearing inside float payloads is astronomically unlikely."""
    out = bytearray()
    window = bytearray()
    while True:
        b = r.read_byte()
        out.append(b)
        window.append(b)
        if len(window) > len(needle):
            del window[0]
        if bytes(window) == needle:
            return bytes(out)


def read_nnet3(path_or_bytes) -> Nnet3Model:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        r = BinaryReader(bytes(path_or_bytes))
    else:
        r = BinaryReader.open(path_or_bytes)
    first2 = r.read_bytes(2)
    if first2 != b"\x00B":
        raise ValueError("not a Kaldi binary file (missing \\0B header); "
                         "use models/kaldi_loader.py for text models")
    tm: Optional[bytes] = None
    _skip_ws(r)
    mk = _peek_marker(r, len("<TransitionModel>"))
    if mk.startswith(b"<TransitionModel>"):
        tm = _scan_past(r, b"</TransitionModel>")
        # trailing space after the close token
        if r.peek_byte() == 0x20:
            r.read_byte()
            tm += b" "
    tok = _read_token(r)
    if tok != "<Nnet3>":
        raise ValueError(f"expected <Nnet3>, got {tok!r}")
    # config lines: text until a blank line
    config_lines: List[str] = []
    line = bytearray()
    # consume exactly the ONE newline right after "<Nnet3> " — a second
    # newline is the blank line that ends an empty config section
    if r.peek_byte() == 0x0D:
        r.read_byte()
    if r.peek_byte() == 0x0A:
        r.read_byte()
    while True:
        b = r.read_byte()
        if b == 0x0A:
            s = line.decode("utf-8").strip()
            line.clear()
            if not s:
                break
            config_lines.append(s)
        else:
            line.append(b)
    r.expect_token("<NumComponents>")
    n = r.read_basic_int()
    comps: List[BinaryComponent] = []
    for _ in range(n):
        _skip_ws(r)
        tok = _read_token(r)
        if tok != "<ComponentName>":
            raise ValueError(f"expected <ComponentName>, got {tok!r}")
        name = _read_token(r)
        comp = read_component(r)
        comp.name = name
        comps.append(comp)
    tok = _read_token(r)
    if tok != "</Nnet3>":
        raise ValueError(f"expected </Nnet3>, got {tok!r}")
    return Nnet3Model(config_lines=config_lines, components=comps,
                      transition_model=tm)


def write_nnet3(model: Nnet3Model, path: Optional[str] = None) -> bytes:
    w = BinaryWriter()
    w.write_bytes(b"\x00B")
    if model.transition_model is not None:
        w.write_bytes(model.transition_model)
    w.write_token("<Nnet3>")
    w.write_bytes(b"\n")
    for line in model.config_lines:
        w.write_bytes(line.encode("utf-8") + b"\n")
    w.write_bytes(b"\n")
    w.write_token("<NumComponents>")
    w.write_basic_int(len(model.components), with_space=False)
    for comp in model.components:
        w.write_token("<ComponentName>")
        w.write_token(comp.name)
        write_component(w, comp)
    w.write_token("</Nnet3>")
    data = w.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


# ---------------------------------------------------------------------------
# bridge to the text-loader component model
# ---------------------------------------------------------------------------

def to_kaldi_components(model: Nnet3Model):
    """Convert parsed binary components into the KaldiComponent dict the
    text loader's `load_params_from_components` consumes."""
    from kaldi_fp16_tpu.models.kaldi_loader import (
        KaldiComponent, _FLOAT_TAGS, _INT_TAGS as _TXT_INT_TAGS,
        _MATRIX_TAGS,
    )
    out: Dict[str, KaldiComponent] = {}
    for c in model.components:
        kc = KaldiComponent(name=c.name, type=c.type)
        for tag, attr in _FLOAT_TAGS.items():
            if tag in c.scalars:
                setattr(kc, attr, float(c.scalars[tag]))
        for tag, attr in _TXT_INT_TAGS.items():
            if tag in c.ints:
                setattr(kc, attr, int(c.ints[tag]))
        for tag, attr in _MATRIX_TAGS.items():
            if tag in c.matrices:
                setattr(kc, attr, c.matrices[tag])
            elif tag in c.vectors:
                setattr(kc, attr, c.vectors[tag])
        # bias/stats are vectors in Kaldi; matrices dict holds 2-d only
        out[c.name] = kc
    return out


def components_from_text(components: Dict) -> List[BinaryComponent]:
    """Inverse bridge: text-parsed KaldiComponents -> binary components
    (canonical tag spelling, float32)."""
    from kaldi_fp16_tpu.models.kaldi_loader import (
        _FLOAT_TAGS, _INT_TAGS as _TXT_INT_TAGS, _MATRIX_TAGS,
    )
    inv_f = {v: k for k, v in _FLOAT_TAGS.items()}
    inv_i = {v: k for k, v in _TXT_INT_TAGS.items()}
    out: List[BinaryComponent] = []
    for name, kc in components.items():
        bc = BinaryComponent(name=name, type=kc.type)
        for attr, tag in inv_i.items():
            v = getattr(kc, attr)
            if v:
                bc.ints[tag] = int(v)
        for attr, tag in inv_f.items():
            v = getattr(kc, attr)
            if v:
                bc.scalars[tag] = float(v)
        if kc.linear_params is not None:
            tag = ("<Params>" if kc.type == "TimeHeightConvolutionComponent"
                   else "<LinearParams>")
            bc.matrices[tag] = np.asarray(kc.linear_params, np.float32)
        if kc.bias_params is not None:
            bc.vectors["<BiasParams>"] = np.asarray(kc.bias_params,
                                                    np.float32)
        if kc.stats_mean is not None:
            bc.vectors["<StatsMean>"] = np.asarray(kc.stats_mean, np.float32)
        if kc.stats_var is not None:
            bc.vectors["<StatsVar>"] = np.asarray(kc.stats_var, np.float32)
        out.append(bc)
    return out
