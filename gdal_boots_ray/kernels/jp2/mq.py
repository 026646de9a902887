"""MQ arithmetic coder (ITU-T T.800 Annex C / T.88) — the adaptive
binary coder under every JPEG 2000 code-block.

Implements the software-convention flowcharts (ENCODE/CODEMPS/
CODELPS/RENORME/BYTEOUT, FLUSH; INITDEC/DECODE/BYTEIN/RENORMD) with
0xFF byte stuffing and carry propagation.  Encoder and decoder share
the 47-state probability table, so round-trip correctness is
self-verifying (tests/test_jp2.py drives random context streams).

Reference behavior studied from the public spec; structure follows
the widely published state machine (cf. reference repo's use of
GDAL's JP2 driver, options.py:95-122 — this replaces that seam with
a from-scratch codec).
"""

from __future__ import annotations

from typing import List, Tuple

# (Qe, NMPS, NLPS, SWITCH) — T.800 Table C.2
QE_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1),
    (0x3401, 2, 6, 0),
    (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0),
    (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1),
    (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0),
    (0x3001, 11, 17, 0),
    (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0),
    (0x1601, 29, 21, 0),
    (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0),
    (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0),
    (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0),
    (0x2401, 23, 20, 0),
    (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0),
    (0x1801, 26, 23, 0),
    (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0),
    (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0),
    (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0),
    (0x0441, 35, 32, 0),
    (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0),
    (0x0141, 38, 35, 0),
    (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0),
    (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0),
    (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0),
    (0x5601, 46, 46, 0),
)

N_CONTEXTS = 19  # 0..16 ZC/SC/MR, 17 RUN (ctx 17), 18 UNIFORM (ctx 18)
CTX_UNI = 18
CTX_RUN = 17


def initial_states(n: int = N_CONTEXTS) -> Tuple[List[int], List[int]]:
    """(index, mps) per context — T.800 D.7 initial states: UNIFORM
    starts at state 46, RUN at 3, context 0 (ZC all-zero) at 4, the
    rest at 0."""
    idx = [0] * n
    mps = [0] * n
    idx[0] = 4
    idx[CTX_RUN] = 3
    idx[CTX_UNI] = 46
    return idx, mps


class MQEncoder:
    def __init__(self, n_ctx: int = N_CONTEXTS):
        self.idx, self.mps = initial_states(n_ctx)
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0])  # sentinel "byte before the stream"

    def encode(self, d: int, cx: int) -> None:
        qe, nmps, nlps, switch = QE_TABLE[self.idx[cx]]
        if d == self.mps[cx]:
            # CODEMPS
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.idx[cx] = nmps
                self._renorme()
            else:
                self.c += qe
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - self.mps[cx]
            self.idx[cx] = nlps
            self._renorme()

    def _renorme(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                self.out[-1] += 1  # carry
                if self.out[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    self.out.append((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self.out.append((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        data = bytes(self.out[1:])  # drop the sentinel
        if data and data[-1] == 0xFF:
            data = data[:-1]
        return data


class MQDecoder:
    def __init__(self, data: bytes, n_ctx: int = N_CONTEXTS):
        self.idx, self.mps = initial_states(n_ctx)
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d = self.data
        if self.bp < len(d) and d[self.bp] == 0xFF:
            nxt = d[self.bp + 1] if self.bp + 1 < len(d) else 0xFF
            if nxt > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += d[self.bp] << 9
                self.ct = 7
        else:
            self.bp += 1
            b = d[self.bp] if self.bp < len(d) else 0xFF
            self.c += b << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = QE_TABLE[self.idx[cx]]
        self.a -= qe
        if (self.c >> 16) < qe:
            # lower sub-interval (LPS path with conditional exchange)
            if self.a < qe:
                self.a = qe
                d = self.mps[cx]
                self.idx[cx] = nmps
            else:
                self.a = qe
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.idx[cx] = nlps
            self._renormd()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - self.mps[cx]
                    if switch:
                        self.mps[cx] = 1 - self.mps[cx]
                    self.idx[cx] = nlps
                else:
                    d = self.mps[cx]
                    self.idx[cx] = nmps
                self._renormd()
            else:
                d = self.mps[cx]
        return d

    def _renormd(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
