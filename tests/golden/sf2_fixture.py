"""Minimal in-memory .sf2 writer for tests.

Emits a spec-conformant RIFF sfbk with one or more presets, each with one
instrument whose zones carry explicit generator lists — enough surface to
exercise the parser's hydra walk, zone resolution, and the synth's
pitch/loop/envelope handling.  (The reference ships no .sf2; users supply
a GM SoundFont at runtime, audio.rs:630.)
"""

import io
import struct

import numpy as np

from bonnie32_tpu.audio import sf2 as S


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\0" if len(payload) & 1 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _name20(s: str) -> bytes:
    return s.encode("ascii")[:19].ljust(20, b"\0")


def build_sf2(samples: np.ndarray, sample_defs, presets) -> bytes:
    """samples: int16 PCM pool.

    sample_defs: list of dicts(name, start, end, start_loop, end_loop,
        sample_rate, original_key, correction).
    presets: list of dicts(name, bank, patch, zones=[zone...]) where each
        zone is a dict of generator-opcode -> amount plus 'sample' index;
        keyRange/velRange amounts use lo|hi<<8 packing.
    """
    smpl = samples.astype("<i2").tobytes()

    phdr = b""
    pbag = b""
    pgen = b""
    inst = b""
    ibag = b""
    igen = b""

    # one instrument per preset, one preset zone pointing at it
    n_pre = len(presets)
    for i, p in enumerate(presets):
        phdr += _name20(p["name"]) + struct.pack(
            "<HHHIII", p["patch"], p["bank"], i, 0, 0, 0)
        pbag += struct.pack("<HH", len(pgen) // 4, 0)
        pgen += struct.pack("<Hh", S.G_INSTRUMENT, i)
    phdr += _name20("EOP") + struct.pack("<HHHIII", 0, 0, n_pre, 0, 0, 0)
    pbag += struct.pack("<HH", len(pgen) // 4, 0)

    for i, p in enumerate(presets):
        inst += _name20(p["name"] + "-i") + struct.pack("<H", len(ibag) // 4)
        for zone in p["zones"]:
            ibag += struct.pack("<HH", len(igen) // 4, 0)
            items = [(k, v) for k, v in zone.items() if k != "sample"]
            # keyRange must be first, sampleID last (spec 8.1.2)
            items.sort(key=lambda kv: (kv[0] != S.G_KEY_RANGE,))
            for oper, amount in items:
                igen += struct.pack("<Hh", oper,
                                    struct.unpack(
                                        "<h", struct.pack(
                                            "<H", amount & 0xFFFF))[0])
            igen += struct.pack("<Hh", S.G_SAMPLE_ID, zone["sample"])
    inst += _name20("EOI") + struct.pack("<H", len(ibag) // 4)
    ibag += struct.pack("<HH", len(igen) // 4, 0)

    shdr = b""
    for sd in sample_defs:
        shdr += _name20(sd["name"]) + struct.pack(
            "<IIIIIBbHH", sd["start"], sd["end"], sd["start_loop"],
            sd["end_loop"], sd["sample_rate"], sd["original_key"],
            sd.get("correction", 0), 0, 1)
    shdr += _name20("EOS") + struct.pack("<IIIIIBbHH", 0, 0, 0, 0, 0, 0,
                                         0, 0, 0)

    info = (_chunk(b"ifil", struct.pack("<HH", 2, 1))
            + _chunk(b"isng", b"EMU8000\0")
            + _chunk(b"INAM", b"test-font\0"))
    pdta = (_chunk(b"phdr", phdr) + _chunk(b"pbag", pbag)
            + _chunk(b"pmod", b"\0" * 10) + _chunk(b"pgen", pgen)
            + _chunk(b"inst", inst) + _chunk(b"ibag", ibag)
            + _chunk(b"imod", b"\0" * 10) + _chunk(b"igen", igen)
            + _chunk(b"shdr", shdr))

    body = (_list(b"INFO", info) + _list(b"sdta", _chunk(b"smpl", smpl))
            + _list(b"pdta", pdta))
    return _chunk(b"RIFF", b"sfbk" + body)


def sine_font(n: int = 2048, rate: int = 44100, root: int = 60,
              loop: bool = True) -> bytes:
    """One looping sine sample across the full key range, preset 0:0."""
    t = np.arange(n)
    cycles = 32
    wave = (np.sin(2 * np.pi * cycles * t / n) * 20000).astype(np.int16)
    zone = {S.G_KEY_RANGE: 0 | (127 << 8),
            S.G_SAMPLE_MODES: 1 if loop else 0,
            "sample": 0}
    return build_sf2(
        wave,
        [dict(name="sine", start=0, end=n, start_loop=0, end_loop=n,
              sample_rate=rate, original_key=root)],
        [dict(name="sinepre", bank=0, patch=0, zones=[zone])])
