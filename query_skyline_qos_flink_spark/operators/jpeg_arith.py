"""Arithmetic-coded JPEG entropy layer — ITU-T T.81 Annexes D & F.

Closes the "arithmetic-coded JPEG" external-decoder seam declared in
:mod:`.multimodal` since round 12: the round-16 shared-library rescan
found libjpeg-turbo 2.1.5 with the arithmetic entropy coders compiled in
(``jinit_arith_decoder``/``jinit_arith_encoder`` exported), which gives
this from-scratch implementation an in-sandbox conformance target
(``tools/jpeg_shim.c`` + ``tests/test_jpeg_arith.py``: our encodes must
decode bit-exactly in libjpeg and vice versa).

What's here:

* The QM-coder — the binary arithmetic coder of T.81 Annex D (encode)
  and Annex F (decode): 16-bit interval register ``A``, code register
  ``C``, renormalization-driven probability adaptation over the
  113-state estimator of Table D.3 (plus the fixed equiprobable state
  used for AC sign decisions).  The state-transition table below is the
  STANDARD'S data, transcribed from ITU-T T.81 Table D.3; a conformance
  test cross-checks every row against the system library's exported
  ``jpeg_aritab`` so a transcription slip cannot survive.
* Marker-safe byte stuffing: a literal ``0xFF`` entropy byte is emitted
  as ``FF 00``; ``FF`` followed by non-zero is a marker and the decoder
  feeds zero bytes from there on (T.81 D.1.6 / F.2.2.5 conventions, the
  same ones the system library speaks — verified empirically against
  its output before this module was written).
* The DC and AC statistical models of Annex F.1.4.4: per-component DC
  difference conditioning on the previous difference's five-way
  classification (L/U conditioning bounds from the DAC segment,
  defaults L=0, U=1), 49-bin DC statistics areas; per-coefficient-index
  AC model with the ``Kx`` low/high frequency split (default 5),
  245-bin AC statistics areas; AC signs through the fixed state.

Scope: sequential DCT (SOF9) scans — interleaved or single-component,
8- and 12-bit precision, arbitrary sampling factors, restart markers
(each restart re-initializes the coder and zeroes every statistics area
and DC predictor, per the standard).  Progressive arithmetic (SOF10)
remains declared at the caller (:func:`.multimodal.decode_jpeg`).

The host codec (:mod:`.multimodal`) supplies frame geometry, MCU
traversal and the DCT/quantization halves; this module is purely the
entropy layer, mirroring how its Huffman twin is layered.
"""

from __future__ import annotations

# ITU-T T.81 Table D.3 — Qe value and probability-estimation state
# machine: (Qe, NMPS, NLPS, SWITCH) per state 0..112; row 113 is the
# fixed (non-adapting) state used for AC sign decisions (F.1.4.4.1.2).
# Standard data, not code; cross-checked bit-for-bit against the system
# libjpeg's exported `jpeg_aritab` in tests/test_jpeg_arith.py.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]
_FIXED_BIN = 113  # equiprobable, non-adapting: AC sign decisions

# default conditioning (T.81 F.1.4.4.1.3 / F.1.4.4.2, absent a DAC segment)
DEFAULT_DC_L = 0
DEFAULT_DC_U = 1
DEFAULT_AC_KX = 5

DC_STATS_BINS = 49
AC_STATS_BINS = 245


def _new_stats(n: int) -> bytearray:
    """A statistics area: per bin, bits 0-6 = estimator state index,
    bit 7 = current MPS sense.  Zeroed = state 0 / MPS 0, the standard's
    initial condition (and the post-restart condition)."""
    return bytearray(n)


class ArithDecoder:
    """T.81 Annex F QM decoder over a JPEG entropy segment.

    ``data``/``pos`` address the first entropy byte after SOS (or after
    a restart marker).  The decoder consumes through the FF00 unstuffing
    rule; on meeting a marker it feeds zero bytes indefinitely (F.2.2.5)
    and remembers the marker offset so the caller can resynchronize
    (``marker_pos``)."""

    __slots__ = ("data", "pos", "end", "_marker_pos", "c", "a", "_bits", "_cur")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self._marker_pos: int | None = None
        # INITDEC: interval [0, 0x10000); C = the first 16 code bits
        self.c = (self._byte() << 8) | self._byte()
        self.a = 0x10000
        self._bits = 0
        self._cur = 0

    def _byte(self) -> int:
        if self._marker_pos is not None:
            return 0x00  # zero-fill past the marker (F.2.2.5)
        d, p = self.data, self.pos
        if p >= self.end:
            self._marker_pos = p
            return 0x00
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        # FF: stuffed data byte or marker
        if p + 1 < self.end and d[p + 1] == 0x00:
            self.pos = p + 2
            return 0xFF
        self._marker_pos = p
        return 0x00

    def _bit(self) -> int:
        if self._bits == 0:
            self._cur = self._byte()
            self._bits = 8
        self._bits -= 1
        return (self._cur >> self._bits) & 1

    @property
    def marker_pos(self) -> int:
        """Offset of the terminating marker's 0xFF (scanning forward when
        the coder stopped short of it)."""
        if self._marker_pos is not None:
            return self._marker_pos
        d, p = self.data, self.pos
        while p < self.end and d[p] != 0xFF:
            p += 1
        while p + 1 < self.end and d[p + 1] == 0x00:
            p += 2
            while p < self.end and d[p] != 0xFF:
                p += 1
        return p

    def decode(self, stats: bytearray, i: int) -> int:
        """One binary decision against statistics bin ``stats[i]``
        (DECODE + MPS/LPS_EXCHANGE + RENORMD, figures F.20-F.26)."""
        s = stats[i]
        qe, nmps, nlps, switch = _QE[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if self.c < a:
            if a & 0x8000:
                self.a = a
                return mps
            # renormalization MPS path, with conditional exchange
            if a < qe:
                d = mps ^ 1
                stats[i] = ((mps ^ switch) << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            self.c -= a
            if a < qe:
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = mps ^ 1
                stats[i] = ((mps ^ switch) << 7) | nlps
            a = qe
        while True:
            a <<= 1
            self.c = (self.c << 1) | self._bit()
            if a & 0x8000:
                break
        self.a = a
        return d


class ArithEncoder:
    """T.81 Annex D QM encoder producing a JPEG entropy segment.

    Byte stuffing (FF -> FF 00) and carry propagation over stacked FF
    bytes per D.1.6; ``flush()`` terminates the interval (CLEARBITS +
    final byteouts, D.1.8.6) and returns the segment WITHOUT trailing
    zero bytes (the decoder zero-fills past the end, so they are
    redundant — the same discard the system library performs)."""

    __slots__ = ("a", "c", "ct", "_buf", "_sc", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # shifts until the first complete output byte
        self._buf: int | None = None  # last unflushed byte (carry target)
        self._sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # byte stuffing (D.1.6)

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:
            # carry: propagates into the pending byte; stacked FFs flip
            # to 00 with the carry passing through them
            if self._buf is not None:
                self._emit(self._buf + 1)  # buf < 0xFF (FF would be stacked)
            for _ in range(self._sc):
                self.out.append(0x00)
            self._sc = 0
            self._buf = t & 0xFF
        elif t == 0xFF:
            self._sc += 1  # defer: a later carry may still flip it
        else:
            if self._buf is not None:
                self._emit(self._buf)
            for _ in range(self._sc):
                self._emit(0xFF)
            self._sc = 0
            self._buf = t

    def code(self, stats: bytearray, i: int, bit: int) -> None:
        """One binary decision (CODE0/CODE1 -> CODELPS/CODEMPS +
        RENORME, figures D.13-D.18)."""
        s = stats[i]
        qe, nmps, nlps, switch = _QE[s & 0x7F]
        mps = s >> 7
        a = self.a - qe
        if bit == mps:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the upper part
                self.c += a
                a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if a < qe:  # exchanged: LPS keeps the lower part
                pass
            else:
                self.c += a
                a = qe
            stats[i] = ((mps ^ switch) << 7) | nlps
        while True:
            a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if a & 0x8000:
                break
        self.a = a

    def flush(self) -> bytes:
        # CLEARBITS (D.1.8.6): slide C to the largest-trailing-zeros
        # value still inside the final interval [C, C + A)
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        # push the remaining 16 code bits through the byteout machinery
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self._buf is not None:
            self._emit(self._buf)
            self._buf = None
        for _ in range(self._sc):
            self._emit(0xFF)
        self._sc = 0
        out = self.out
        # discard redundant trailing zeros, but never leave a dangling FF
        # (its stuffed 00 partner must survive with it)
        n = len(out)
        while n > 0 and out[n - 1] == 0x00 and not (n > 1 and out[n - 2] == 0xFF):
            n -= 1
        del out[n:]
        return bytes(out)


class DCModel:
    """Annex F.1.4.4.1 DC-difference model: one 49-bin statistics area
    per DC conditioning table, a per-component context tracking the
    previous difference's five-way classification, and the L/U bounds."""

    __slots__ = ("stats", "l_bound", "u_bound")

    def __init__(self, l: int = DEFAULT_DC_L, u: int = DEFAULT_DC_U):
        self.stats = _new_stats(DC_STATS_BINS)
        self.l_bound = (1 << l) >> 1
        self.u_bound = (1 << u) >> 1

    def classify(self, m: int, sign: int, diff: int) -> int:
        """Next block's context base from THIS difference (F.1.4.4.1.3):
        ``m`` is the decoded/encoded magnitude-category MSB value."""
        if diff == 0:
            return 0
        if m < self.l_bound:
            return 0  # conditioned as zero
        if m > self.u_bound:
            return 12 + sign * 4  # large +/-
        return 4 + sign * 4  # small +/-


class ACModel:
    """Annex F.1.4.4.2 AC model: one 245-bin statistics area per AC
    conditioning table plus the Kx low/high-frequency split."""

    __slots__ = ("stats", "kx")

    def __init__(self, kx: int = DEFAULT_AC_KX):
        self.stats = _new_stats(AC_STATS_BINS)
        self.kx = kx


def decode_dc_diff(dec: ArithDecoder, model: DCModel, ctx: int) -> tuple[int, int]:
    """Decode one DC difference; returns ``(diff, next_ctx)``."""
    st = model.stats
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    i = 20  # X1 (Table F.4)
    if m:
        while dec.decode(st, i):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG: DC magnitude overflow")
            i += 1
    next_ctx = model.classify(m, sign, 1)  # diff != 0 here
    v = m
    i += 14  # matching magnitude-bit bin
    mask = m >> 1
    while mask:
        if dec.decode(st, i):
            v |= mask
        mask >>= 1
    v += 1
    return (-v if sign else v), next_ctx


def encode_dc_diff(enc: ArithEncoder, model: DCModel, ctx: int, diff: int) -> int:
    """Encode one DC difference; returns the next context base."""
    st = model.stats
    if diff == 0:
        enc.code(st, ctx, 0)
        return 0
    enc.code(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.code(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    if sz == 0:
        enc.code(st, ctx + 2 + sign, 0)
        m = 0
    else:
        enc.code(st, ctx + 2 + sign, 1)
        m = 1
        i = 20
        while (m << 1) <= sz:
            enc.code(st, i, 1)
            m <<= 1
            i += 1
        enc.code(st, i, 0)
        i += 14
        mask = m >> 1
        while mask:
            enc.code(st, i, 1 if sz & mask else 0)
            mask >>= 1
    return model.classify(m, sign, diff)


def decode_ac_block(
    dec: ArithDecoder, model: ACModel, fixed: bytearray, out,
    ss: int = 1, se: int = 63, al: int = 0
) -> None:
    """Decode the AC coefficients of one block into ``out`` (zigzag
    order, indices ``ss..se``).  ``al`` is the successive-approximation
    point transform of a progressive FIRST scan (G.2.2: the sequential
    model over point-transformed values, stored ``<< al``); 0 for
    sequential scans."""
    st = model.stats
    kx = model.kx
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC run past band end")
        sign = dec.decode(fixed, 0)
        m = dec.decode(st, base + 2)
        i = base + 2
        if m:
            if dec.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217
                while dec.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic JPEG: AC magnitude overflow")
                    i += 1
        v = m
        i += 14
        mask = m >> 1
        while mask:
            if dec.decode(st, i):
                v |= mask
            mask >>= 1
        v = (v + 1) << al
        out[k] = -v if sign else v
        k += 1


def encode_ac_block(
    enc: ArithEncoder, model: ACModel, fixed: bytearray, zz,
    ss: int = 1, se: int = 63, al: int = 0
) -> None:
    """Encode the AC coefficients ``zz[ss..se]`` (zigzag order); ``al``
    as in :func:`decode_ac_block` (magnitudes code ``|v| >> al``,
    truncation toward zero per G.1.2.2)."""
    st = model.stats
    kx = model.kx
    tval = [0] * (se + 1)
    for k in range(ss, se + 1):
        tval[k] = abs(int(zz[k])) >> al
    ke = se
    while ke >= ss and tval[ke] == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.code(st, base, 0)  # not EOB yet
        while tval[k] == 0:
            enc.code(st, base + 1, 0)
            k += 1
            base += 3
        enc.code(st, base + 1, 1)
        sign = 1 if int(zz[k]) < 0 else 0
        enc.code(fixed, 0, sign)
        sz = tval[k] - 1
        i = base + 2
        if sz == 0:
            enc.code(st, i, 0)
            m = 0
        else:
            enc.code(st, i, 1)
            if sz == 1:
                enc.code(st, i, 0)
                m = 1
            else:
                enc.code(st, i, 1)
                m = 2
                i = 189 if k <= kx else 217
                while (m << 1) <= sz:
                    enc.code(st, i, 1)
                    m <<= 1
                    i += 1
                enc.code(st, i, 0)
        i += 14
        mask = m >> 1
        while mask:
            enc.code(st, i, 1 if sz & mask else 0)
            mask >>= 1
        k += 1
    if ke < se:
        enc.code(st, 3 * (k - 1), 1)  # EOB


def decode_ac_refine(
    dec: ArithDecoder, model: ACModel, fixed: bytearray, out, ss: int, se: int, al: int
) -> None:
    """AC refinement scan (G.2.3): one adaptive correction bit per
    previously-visible coefficient (bin ``base+2``), newly-visible
    coefficients via the zero-run bin (``base+1``) with a fixed-state
    sign, and an EOB decision (bin ``base``) only past EOBx — the last
    previously-visible index, scanned over 1..``se`` like the sequential
    band walk (the block may hold other-band coefficients below ``ss``
    from earlier scans of the progression)."""
    st = model.stats
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= 1 and out[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            return  # EOB
        while True:
            c = int(out[k])
            if c != 0:
                if dec.decode(st, base + 2):
                    out[k] = c + (p1 if c >= 0 else m1)
                break
            if dec.decode(st, base + 1):
                out[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            base += 3
            if k > se:
                raise ValueError("arithmetic JPEG: AC refine run past band end")
        k += 1


def encode_ac_refine(
    enc: ArithEncoder, model: ACModel, fixed: bytearray, zz, ss: int, se: int, al: int
) -> None:
    """Mirror of :func:`decode_ac_refine`: ``ah = al + 1`` defines the
    previously-visible set (``|v| >> ah != 0``); EOBx scans 1..``se``
    over that set, matching the decoder's walk of its reconstruction."""
    st = model.stats
    ah = al + 1
    kex = se
    while kex >= 1 and (abs(int(zz[kex])) >> ah) == 0:
        kex -= 1
    last_new = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(zz[k])) >> al) == 1:
            last_new = k
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if k > last_new:
                enc.code(st, base, 1)  # EOB
                return
            enc.code(st, base, 0)
        while True:
            v = int(zz[k])
            if (abs(v) >> ah) != 0:  # previously visible: correction bit
                enc.code(st, base + 2, (abs(v) >> al) & 1)
                break
            if (abs(v) >> al) != 0:  # newly visible (necessarily == 1)
                enc.code(st, base + 1, 1)
                enc.code(fixed, 0, 1 if v < 0 else 0)
                break
            enc.code(st, base + 1, 0)
            k += 1
            base += 3
        k += 1
