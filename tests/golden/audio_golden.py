"""Scalar golden models of the PS1 SPU reverb and Gaussian resampler
(literal transcriptions of tracker/psx_reverb.rs and tracker/audio.rs)."""

import numpy as np

from bonnie32_tpu.audio.spu_tables import GAUSSIAN_TABLE

BUFFER_SIZE = 0x20000


def mul_vol(sample, volume):
    return max(-32768, min(32767, (sample * volume) >> 15))


class GoldReverb:
    def __init__(self, params, sample_rate=44100):
        self.p = params  # dict-like int access by name
        self.buf_l = [0] * BUFFER_SIZE
        self.buf_r = [0] * BUFFER_SIZE
        self.pos = 0
        self.rate_ratio = sample_rate / 22050.0
        self.accum = 0.0

    def rd(self, buf, off):
        return buf[(self.pos + off) % BUFFER_SIZE]

    def wr(self, buf, off, val):
        buf[(self.pos + off) % BUFFER_SIZE] = max(-32768, min(32767, val))

    def sample22k(self, l_in16, r_in16):
        p = self.p
        l_in = mul_vol(l_in16, p["v_l_in"])
        r_in = mul_vol(r_in16, p["v_r_in"])

        d_l_same = self.rd(self.buf_l, p["d_l_same"])
        m_prev = self.rd(self.buf_l, (p["m_l_same"] - 2) & 0xFFFF)
        v = mul_vol(l_in + mul_vol(d_l_same, p["v_wall"]) - m_prev, p["v_iir"]) + m_prev
        self.wr(self.buf_l, p["m_l_same"], v)

        d_r_same = self.rd(self.buf_r, p["d_r_same"])
        m_prev = self.rd(self.buf_r, (p["m_r_same"] - 2) & 0xFFFF)
        v = mul_vol(r_in + mul_vol(d_r_same, p["v_wall"]) - m_prev, p["v_iir"]) + m_prev
        self.wr(self.buf_r, p["m_r_same"], v)

        d_r_diff = self.rd(self.buf_r, p["d_r_diff"])
        m_prev = self.rd(self.buf_l, (p["m_l_diff"] - 2) & 0xFFFF)
        v = mul_vol(l_in + mul_vol(d_r_diff, p["v_wall"]) - m_prev, p["v_iir"]) + m_prev
        self.wr(self.buf_l, p["m_l_diff"], v)

        d_l_diff = self.rd(self.buf_l, p["d_l_diff"])
        m_prev = self.rd(self.buf_r, (p["m_r_diff"] - 2) & 0xFFFF)
        v = mul_vol(r_in + mul_vol(d_l_diff, p["v_wall"]) - m_prev, p["v_iir"]) + m_prev
        self.wr(self.buf_r, p["m_r_diff"], v)

        l_out = sum(mul_vol(self.rd(self.buf_l, p[f"m_l_comb{i}"]), p[f"v_comb{i}"])
                    for i in (1, 2, 3, 4))
        r_out = sum(mul_vol(self.rd(self.buf_r, p[f"m_r_comb{i}"]), p[f"v_comb{i}"])
                    for i in (1, 2, 3, 4))

        for side, buf in (("l", self.buf_l), ("r", self.buf_r)):
            pass

        l_ap1 = self.rd(self.buf_l, (p["m_l_apf1"] - p["d_apf1"]) & 0xFFFF)
        l_out = l_out - mul_vol(l_ap1, p["v_apf1"])
        self.wr(self.buf_l, p["m_l_apf1"], l_out)
        l_out = mul_vol(l_out, p["v_apf1"]) + l_ap1

        r_ap1 = self.rd(self.buf_r, (p["m_r_apf1"] - p["d_apf1"]) & 0xFFFF)
        r_out = r_out - mul_vol(r_ap1, p["v_apf1"])
        self.wr(self.buf_r, p["m_r_apf1"], r_out)
        r_out = mul_vol(r_out, p["v_apf1"]) + r_ap1

        l_ap2 = self.rd(self.buf_l, (p["m_l_apf2"] - p["d_apf2"]) & 0xFFFF)
        l_out = l_out - mul_vol(l_ap2, p["v_apf2"])
        self.wr(self.buf_l, p["m_l_apf2"], l_out)
        l_out = mul_vol(l_out, p["v_apf2"]) + l_ap2

        r_ap2 = self.rd(self.buf_r, (p["m_r_apf2"] - p["d_apf2"]) & 0xFFFF)
        r_out = r_out - mul_vol(r_ap2, p["v_apf2"])
        self.wr(self.buf_r, p["m_r_apf2"], r_out)
        r_out = mul_vol(r_out, p["v_apf2"]) + r_ap2

        self.pos = (self.pos + 1) % BUFFER_SIZE
        return (max(-32768, min(32767, l_out)), max(-32768, min(32767, r_out)))

    def process(self, left, right, wet, volume=1.0):
        dry = 1.0 - wet
        out_l = left.copy()
        out_r = right.copy()
        for i in range(len(left)):
            self.accum += 1.0 / self.rate_ratio
            while self.accum >= 1.0:
                self.accum -= 1.0
                l16 = int(np.clip(np.trunc(left[i] * 32767.0), -32768, 32767))
                r16 = int(np.clip(np.trunc(right[i] * 32767.0), -32768, 32767))
                lw, rw = self.sample22k(l16, r16)
                out_l[i] = np.float32((left[i] * dry + np.float32(lw / 32767.0) * wet) * volume)
                out_r[i] = np.float32((right[i] * dry + np.float32(rw / 32767.0) * wet) * volume)
        return out_l, out_r


class GoldResampler:
    def __init__(self, pitch):
        self.hl = [0.0] * 4
        self.hr = [0.0] * 4
        self.pc = 0
        self.pitch = pitch
        self.al = 0.0
        self.ar = 0.0
        self.ac = 0

    def gauss(self, h, idx):
        g0 = GAUSSIAN_TABLE[0xFF - idx]
        g1 = GAUSSIAN_TABLE[0x1FF - idx]
        g2 = GAUSSIAN_TABLE[0x100 + idx]
        g3 = GAUSSIAN_TABLE[idx]
        return (g0 * h[0] + g1 * h[1] + g2 * h[2] + g3 * h[3]) / 32768.0

    def process(self, left, right):
        ratio = 0x1000 // self.pitch
        out_l = left.copy()
        out_r = right.copy()
        for i in range(len(left)):
            self.al += left[i]
            self.ar += right[i]
            self.ac += 1
            if self.ac >= ratio:
                avg_l = max(-1.5, min(1.5, self.al / self.ac))
                avg_r = max(-1.5, min(1.5, self.ar / self.ac))
                self.hl = self.hl[1:] + [avg_l]
                self.hr = self.hr[1:] + [avg_r]
                self.al = self.ar = 0.0
                self.ac = 0
            self.pc += self.pitch
            idx = (self.pc >> 4) & 0xFF
            out_l[i] = max(-1.5, min(1.5, self.gauss(self.hl, idx)))
            out_r[i] = max(-1.5, min(1.5, self.gauss(self.hr, idx)))
            if self.pc >= 0x1000:
                self.pc &= 0xFFF
        return out_l, out_r
