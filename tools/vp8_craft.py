#!/usr/bin/env python3
"""Differential VP8 debugging: craft minimal keyframe bitstreams with a
from-scratch bool ENCODER and fully controlled modes/tokens, decode them
with libwebp (ground truth), and emit /tmp/crafted.bin in the fixture
format for graft.Vp8Debug. Each crafted case isolates one semantic
(header layout, mode trees, token contexts, WHT/IDCT, predictors), so
the first mismatching case pinpoints a decoder disagreement exactly.
"""
import ctypes
import struct
import sys

# ---- tables from libwebp .rodata (same signatures as the extractor) ----
LIBPATH = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
_lib = open(LIBPATH, "rb").read()


def _find_coeff_probs():
    i = 0
    while True:
        i = _lib.find(b"\x80" * 33, i + 1)
        assert i > 0
        if _lib[i + 33] != 0x80 and _lib[i + 33] == 253:
            return list(_lib[i:i + 1056])


COEFF_PROBS = _find_coeff_probs()
DC_Q = list(_lib[_lib.find(bytes([4, 5, 6, 7, 8, 9, 10, 10])):][:128])
import re as _re  # noqa: E402
_ac_at = None
for base in range(0, len(_lib) - 256, 2):
    v = struct.unpack_from("<8H", _lib, base)
    if v == (4, 5, 6, 7, 8, 9, 10, 11):
        vv = struct.unpack_from("<128H", _lib, base)
        if vv[-1] == 284:
            AC_Q = list(vv)
            break

KF_Y_PROBS = [145, 156, 163, 128]
KF_UV_PROBS = [142, 114, 183]
KF_Y_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]
UV_TREE = [-0, 2, -1, 4, -2, -3]
B_TREE = [-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9]
BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
CAT_PROBS = [[159], [165, 145], [173, 148, 140], [176, 155, 140, 135],
             [180, 157, 141, 134, 130],
             [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]]
CAT_BASE = [5, 7, 11, 19, 35, 67]

_bm_at = _lib.find(b"\xff" * 32)
# kBModesProba sits right after the 1056-byte update probs
BMODE_PROBS = list(_lib[_bm_at + 1056:_bm_at + 1056 + 900])


class BoolEnc:
    """Big-int arithmetic encoder matching the RFC 6386 bool decoder."""

    def __init__(self):
        self.low = 0
        self.rng = 255
        self.nbits = 0

    def put(self, bit, prob):
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            self.low <<= 1
            self.nbits += 1

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def tree(self, tree, probs, leaf):
        # walk the tree to the leaf, emitting the path bits
        path = []

        def walk(i, bits):
            if i != 0 or not bits:  # root call has bits []
                pass
            a, b = tree[i], tree[i + 1]
            for bit, nxt in ((0, a), (1, b)):
                if nxt <= 0:
                    if -nxt == leaf:
                        path.extend(bits + [(bit, probs[i >> 1])])
                        return True
                else:
                    if walk(nxt, bits + [(bit, probs[i >> 1])]):
                        return True
            return False

        assert walk(0, []), f"leaf {leaf} not in tree"
        for bit, p in path:
            self.put(bit, p)

    def bytes(self):
        # invariant: low + rng <= 2^B with B = nbits + 8, so low fits in
        # B bits; pad to a byte boundary and add decoder lookahead zeros
        B = self.nbits + 8
        nb = (B + 7) // 8
        return (self.low << (nb * 8 - B)).to_bytes(nb, "big") + b"\x00\x00"


def token_block(enc, probs, typ, ctx, first, coeffs, quant_dc, quant_ac):
    """Encode one 4x4 block's tokens. coeffs: dict natural-pos -> RAW
    (pre-quant) integer token value (the DEQUANTIZED value will be
    value*quant). Returns nz flag."""
    # scan positions first..15 in zigzag order
    vals = [coeffs.get(ZIGZAG[n], 0) for n in range(16)]
    last = -1
    for n in range(first, 16):
        if vals[n]:
            last = n
    ctx_cur = ctx
    skip_eob = False
    n = first
    while n < 16:
        base = ((typ * 8 + BANDS[n]) * 3 + ctx_cur) * 11
        p = probs[base:base + 11]
        if n > last:
            if not skip_eob:
                enc.put(0, p[0])  # EOB
            return 1 if last >= first else 0
        if not skip_eob:
            enc.put(1, p[0])
        v = vals[n]
        if v == 0:
            enc.put(0, p[1])
            ctx_cur = 0
            skip_eob = True
            n += 1
            continue
        enc.put(1, p[1])
        a = abs(v)
        if a == 1:
            enc.put(0, p[2]); ctx_cur = 1
        else:
            enc.put(1, p[2]); ctx_cur = 2
            if a <= 4:
                enc.put(0, p[3])
                if a == 2:
                    enc.put(0, p[4])
                else:
                    enc.put(1, p[4]); enc.put(a - 3, p[5])
            else:
                enc.put(1, p[3])
                cat = next(c for c in range(6)
                           if a < CAT_BASE[c] + (1 << len(CAT_PROBS[c]))
                           and a >= CAT_BASE[c])
                if cat <= 1:
                    enc.put(0, p[6]); enc.put(cat, p[7])
                elif cat <= 3:
                    enc.put(1, p[6]); enc.put(0, p[8]); enc.put(cat - 2, p[9])
                else:
                    enc.put(1, p[6]); enc.put(1, p[8]); enc.put(cat - 4, p[10])
                extra = a - CAT_BASE[cat]
                cp = CAT_PROBS[cat]
                for i in range(len(cp) - 1, -1, -1):
                    enc.put((extra >> i) & 1, cp[len(cp) - 1 - i])
        enc.put(1 if v < 0 else 0, 128)
        skip_eob = False
        n += 1
    return 1 if last >= first else 0


def build_frame(w, h, mbs, yac_qi=4, mb_no_skip=1, skip_prob=128,
                filter_level=0, sharpness=0, filter_type=0,
                nparts_log2=0, lf_deltas=None, segmentation=None):
    # lf_deltas: (ref[4], mode[4]); segmentation: dict with keys
    #   absolute (bool), quant[4], lf[4], tree_probs[3]; per-MB "seg" ids
    """mbs: list (raster) of dicts:
       ymode: 0..4 (4=B_PRED), submodes: [16] when B_PRED, uvmode: 0..3,
       skip: bool, y2/y/u/v: coeff dicts (natural pos -> token value);
       y is a list of 16 dicts, u/v lists of 4."""
    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    assert len(mbs) == mb_w * mb_h

    # ---- partition 1: header + modes ----
    e1 = BoolEnc()
    e1.literal(0, 1)  # color space
    e1.literal(0, 1)  # clamping
    if segmentation is None:
        e1.put(0, 128)    # segmentation_enabled = 0
    else:
        e1.put(1, 128)    # enabled
        e1.put(1, 128)    # update map
        e1.put(1, 128)    # update data
        e1.put(1 if segmentation["absolute"] else 0, 128)
        for q in segmentation["quant"]:
            e1.put(1, 128); e1.literal(abs(q), 7); e1.put(1 if q < 0 else 0, 128)
        for f in segmentation["lf"]:
            e1.put(1, 128); e1.literal(abs(f), 6); e1.put(1 if f < 0 else 0, 128)
        for p in segmentation["tree_probs"]:
            e1.put(1, 128); e1.literal(p, 8)
    e1.literal(filter_type, 1)
    e1.literal(filter_level, 6)
    e1.literal(sharpness, 3)
    if lf_deltas is None:
        e1.put(0, 128)    # lf delta enabled = 0
    else:
        e1.put(1, 128)    # enabled
        e1.put(1, 128)    # update
        for d in lf_deltas[0] + lf_deltas[1]:
            if d == 0:
                e1.put(0, 128)
            else:
                e1.put(1, 128); e1.literal(abs(d), 6)
                e1.put(1 if d < 0 else 0, 128)
    e1.literal(nparts_log2, 2)
    e1.literal(yac_qi, 7)
    for _ in range(5):
        e1.put(0, 128)  # all quant deltas absent
    e1.literal(1, 1)  # refresh entropy
    upd_at = _lib.find(b"\xff" * 32)
    UPDATE_PROBS = list(_lib[upd_at:upd_at + 1056])
    for i in range(1056):
        e1.put(0, UPDATE_PROBS[i])  # no prob updates
    e1.put(mb_no_skip, 128)
    if mb_no_skip:
        e1.literal(skip_prob, 8)

    above_sub = [0] * (mb_w * 4)
    for my in range(mb_h):
        left_sub = [0] * 4
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            if segmentation is not None:
                sid = mb.get("seg", 0)
                tp = segmentation["tree_probs"]
                # segment tree {2,4, -0,-1, -2,-3}
                if sid < 2:
                    e1.put(0, tp[0]); e1.put(sid, tp[1])
                else:
                    e1.put(1, tp[0]); e1.put(sid - 2, tp[2])
            if mb_no_skip:
                e1.put(1 if mb.get("skip") else 0, skip_prob)
            ym = mb["ymode"]
            e1.tree(KF_Y_TREE, KF_Y_PROBS, ym)
            if ym == 4:
                sm = mb["submodes"]
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mx * 4 + c] if r == 0 else sm[(r - 1) * 4 + c]
                        l = left_sub[r] if c == 0 else sm[r * 4 + c - 1]
                        # libwebp's .rodata table rows follow ITS enum
                        # (RD=4, VR=5, LD=6); permute from RFC numbering
                        PERM = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
                        pa, pl_ = PERM[a], PERM[l]
                        probs = BMODE_PROBS[(pa * 10 + pl_) * 9:(pa * 10 + pl_) * 9 + 9]
                        e1.tree(B_TREE, probs, sm[r * 4 + c])
                for i in range(4):
                    above_sub[mx * 4 + i] = sm[12 + i]
                    left_sub[i] = sm[i * 4 + 3]
            else:
                imp = [0, 2, 3, 1][ym]
                for i in range(4):
                    above_sub[mx * 4 + i] = imp
                    left_sub[i] = imp
            e1.tree(UV_TREE, KF_UV_PROBS, mb["uvmode"])
    part1 = e1.bytes()

    # ---- token partitions with ctx tracking (row & (n-1)) ----
    nparts = 1 << nparts_log2
    encs = [BoolEnc() for _ in range(nparts)]
    a_y = [0] * (mb_w * 4); a_u = [0] * (mb_w * 2); a_v = [0] * (mb_w * 2)
    a_y2 = [0] * mb_w
    for my in range(mb_h):
        e2 = encs[my & (nparts - 1)]
        l_y = [0] * 4; l_u = [0] * 2; l_v = [0] * 2; l_y2 = 0
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            has_y2 = mb["ymode"] != 4
            if mb.get("skip"):
                for i in range(4): a_y[mx * 4 + i] = 0; l_y[i] = 0
                for i in range(2):
                    a_u[mx * 2 + i] = 0; l_u[i] = 0
                    a_v[mx * 2 + i] = 0; l_v[i] = 0
                if has_y2:
                    a_y2[mx] = 0; l_y2 = 0
                continue
            if has_y2:
                nz = token_block(e2, COEFF_PROBS, 1, a_y2[mx] + l_y2, 0,
                                 mb.get("y2", {}), 0, 0)
                a_y2[mx] = nz; l_y2 = nz
            typ = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            for r in range(4):
                for c in range(4):
                    b = r * 4 + c
                    nz = token_block(e2, COEFF_PROBS, typ,
                                     a_y[mx * 4 + c] + l_y[r], first,
                                     mb.get("y", [{}] * 16)[b], 0, 0)
                    a_y[mx * 4 + c] = nz; l_y[r] = nz
            for pl, (a_c, l_c) in enumerate([(a_u, l_u), (a_v, l_v)]):
                blocks = mb.get("u" if pl == 0 else "v", [{}] * 4)
                for r in range(2):
                    for c in range(2):
                        nz = token_block(e2, COEFF_PROBS, 2,
                                         a_c[mx * 2 + c] + l_c[r], 0,
                                         blocks[r * 2 + c], 0, 0)
                        a_c[mx * 2 + c] = nz; l_c[r] = nz
    parts = [e.bytes() for e in encs]

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    hdr = bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff,
                 0x9d, 0x01, 0x2a,
                 w & 0xff, (w >> 8) & 0x3f, h & 0xff, (h >> 8) & 0x3f])
    sizes = b"".join(struct.pack("<I", len(p))[:3] for p in parts[:-1])
    return hdr + part1 + sizes + b"".join(parts)


def wrap_webp(vp8):
    n = len(vp8)
    chunk = b"VP8 " + struct.pack("<I", n) + vp8 + (b"\x00" if n % 2 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# ---- libwebp ground truth ----
rt = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
rt.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
rt.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
rt.WebPFree.restype = None
rt.WebPFree.argtypes = [ctypes.c_void_p]


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = rt.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(u), ctypes.byref(v),
                         ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = b"".join(ctypes.string_at(ctypes.addressof(y.contents) +
                                   r * stride.value, W) for r in range(H))
    up = b"".join(ctypes.string_at(ctypes.addressof(u.contents) +
                                   r * uv_stride.value, cw) for r in range(ch))
    vp = b"".join(ctypes.string_at(ctypes.addressof(v.contents) +
                                   r * uv_stride.value, cw) for r in range(ch))
    rt.WebPFree(y)
    return W, H, yp, up, vp


def main():
    cases = []

    def mb(ymode=0, uvmode=0, **kw):
        d = {"ymode": ymode, "uvmode": uvmode}
        d.update(kw)
        return d

    # 1: one MB, DC16, Y2 dc only
    cases.append(("dc16_y2dc", 16, 16, [mb(y2={0: 4})], {}))
    # 2: DC16 + one AC in first Y block
    ys = [{} for _ in range(16)]; ys[0] = {1: 3}
    cases.append(("dc16_y0ac", 16, 16, [mb(y2={0: 4}, y=ys)], {}))
    # 3: AC in EVERY Y block at varying positions
    ys = [{(i % 15) + 1: (i % 5) + 1} for i in range(16)]
    cases.append(("dc16_yacs", 16, 16, [mb(y2={0: 2}, y=ys)], {}))
    # 4: V16 / H16 / TM16
    cases.append(("v16", 16, 16, [mb(ymode=1, y2={0: 4})], {}))
    cases.append(("h16", 16, 16, [mb(ymode=2, y2={0: 4})], {}))
    cases.append(("tm16", 16, 16, [mb(ymode=3, y2={0: 4})], {}))
    # 5: B_PRED, every submode, no residuals
    for m in range(10):
        cases.append((f"bpred_m{m}", 16, 16,
                      [mb(ymode=4, submodes=[m] * 16)], {}))
    # 6: B_PRED mixed submodes + residuals (type-3 blocks, first=0)
    sm = [(i * 7) % 10 for i in range(16)]
    ys = [{0: 2, 5: 1} for _ in range(16)]
    cases.append(("bpred_mix_res", 16, 16,
                  [mb(ymode=4, submodes=sm, y=ys)], {}))
    # 7: UV residuals + uv modes
    cases.append(("uv_res", 16, 16,
                  [mb(uvmode=3, y2={0: 4},
                      u=[{0: 3, 1: 2}, {}, {2: 1}, {}],
                      v=[{}, {0: -2}, {}, {15: 1}])], {}))
    # 8: big values through every category (cat1..cat6)
    ys = [{} for _ in range(16)]
    for i, a in enumerate([5, 6, 7, 10, 11, 18, 19, 34, 35, 66, 67, 100,
                           500, 1000, 2000, 2047]):
        ys[i] = {1: a if i % 2 == 0 else -a}
    cases.append(("cats", 16, 16, [mb(y2={0: 4}, y=ys)], {"yac_qi": 100}))
    # 9: zero runs (0,0,val patterns)
    ys = [{3: 1} for _ in range(16)]  # two leading zeros after first=1
    cases.append(("zruns", 16, 16, [mb(y2={0: 4}, y=ys)], {}))
    # 10: multi-MB 64x32 with ctx propagation + skips
    grid = []
    for i in range(8):
        if i % 3 == 2:
            grid.append(mb(skip=True))
        else:
            ys = [{1: (i % 4) + 1} if (b + i) % 2 == 0 else {}
                  for b in range(16)]
            grid.append(mb(ymode=i % 4, y2={0: 2 + i % 3}, y=ys))
    cases.append(("multi_skip", 64, 32, grid, {}))
    # 11: B_PRED next to 16x16 (submode ctx from implied modes)
    grid = [mb(ymode=3, y2={0: 4}),
            mb(ymode=4, submodes=[(i * 3) % 10 for i in range(16)]),
            mb(ymode=4, submodes=[9 - (i % 10) for i in range(16)]),
            mb(ymode=0, y2={0: 4})]
    cases.append(("bpred_ctx", 64, 16, grid, {}))
    # 12: mb_no_skip = 0 (no per-MB skip bits at all)
    cases.append(("noskipflag", 16, 16, [mb(y2={0: 4})],
                  {"mb_no_skip": 0}))
    # 13: loop filter exercise: level 32, content with edges
    ys = [{0: 20, 1: -15, 4: 10} for _ in range(16)]
    grid = [mb(ymode=0, y2={0: 30}, y=ys),
            mb(ymode=4, submodes=[i % 10 for i in range(16)], y=ys)]
    cases.append(("filter_n32", 32, 16, grid,
                  {"filter_level": 32, "yac_qi": 60}))
    cases.append(("filter_sharp", 32, 16, grid,
                  {"filter_level": 45, "sharpness": 3, "yac_qi": 60}))
    cases.append(("filter_simple", 32, 16, grid,
                  {"filter_level": 32, "filter_type": 1, "yac_qi": 60}))
    # 14: odd dims (crop + edge MBs)
    grid = [mb(y2={0: 4}, y=[{2: 2}] * 16), mb(ymode=4,
            submodes=[4] * 16, y=[{0: 3}] * 16)]
    cases.append(("odd_dims", 17, 13, grid + [], {}))
    # high quantizer indices (uv dc 132 clamp, y2 scaling)
    cases.append(("hi_q", 16, 16,
                  [mb(y2={0: 3}, u=[{0: 2}] * 4)], {"yac_qi": 127}))
    # multi token partitions: 3 MB rows assigned round-robin
    grid = []
    for i in range(6):
        ys = [{(b % 7) + 1: (i % 3) + 1} if (b + i) % 3 == 0 else {}
              for b in range(16)]
        grid.append(mb(ymode=i % 4, y2={0: 2}, y=ys))
    cases.append(("nparts2", 32, 48, grid, {"nparts_log2": 1}))
    cases.append(("nparts4", 32, 48, grid, {"nparts_log2": 2}))
    # loop-filter deltas: ref[0] applies to every keyframe MB, mode[0]
    # only to B_PRED MBs
    grid = [mb(ymode=0, y2={0: 25}, y=[{1: 8}] * 16),
            mb(ymode=4, submodes=[(i * 3) % 10 for i in range(16)],
               y=[{0: 8}] * 16)]
    cases.append(("lf_deltas", 32, 16, grid,
                  {"filter_level": 24, "yac_qi": 50,
                   "lf_deltas": ([6, 0, 0, 0], [-4, 0, 0, 0])}))
    # segmentation: absolute + delta quantizers, per-segment filter
    segcfg = {"absolute": True, "quant": [10, 60, 100, 127],
              "lf": [0, 20, 40, 63], "tree_probs": [100, 140, 180]}
    grid = [mb(seg=s % 4, ymode=s % 4, y2={0: 3},
               y=[{1: 2}] * 16) for s in range(8)]
    cases.append(("seg_abs", 64, 32, grid,
                  {"filter_level": 20, "yac_qi": 40,
                   "segmentation": segcfg}))
    segcfg2 = {"absolute": False, "quant": [-20, 0, 20, 60],
               "lf": [-10, 0, 10, 30], "tree_probs": [128, 128, 128]}
    cases.append(("seg_delta", 64, 32, grid,
                  {"filter_level": 30, "yac_qi": 60,
                   "segmentation": segcfg2}))
    # simple filter with pure 16x16 MBs (uncontaminated by B_PRED)
    grid = [mb(ymode=0, y2={0: 30}, y=[{1: 12, 4: -9}] * 16),
            mb(ymode=3, y2={0: -25}, y=[{2: 10}] * 16)]
    cases.append(("simple_16", 32, 16, grid,
                  {"filter_level": 40, "filter_type": 1, "yac_qi": 70}))

    out = bytearray(b"VP8FIX01")
    ok = 0
    recs = []
    for rec in cases:
        name, w, h, grid, kw = rec
        if len(grid) < ((w + 15) // 16) * ((h + 15) // 16):
            print(f"SKIP {name}: grid size")
            continue
        vp8 = build_frame(w, h, grid, **kw)
        webp = wrap_webp(vp8)
        got = decode_yuv(webp)
        if got is None:
            print(f"LIBWEBP-REJECT {name}")
            continue
        W, H, yp, up, vp = got
        if (W, H) != (w, h):
            print(f"DIMS {name}")
            continue
        ok += 1
        recs.append((name, webp, W, H, yp, up, vp))
    out += struct.pack("<i", len(recs))
    for name, webp, W, H, yp, up, vp in recs:
        nb = name.encode()
        out += struct.pack("<i", len(nb)) + nb
        out += struct.pack("<i", len(webp)) + webp
        out += struct.pack("<ii", W, H) + yp + up + vp
    with open("/tmp/crafted.bin", "wb") as f:
        f.write(out)
    print(f"wrote /tmp/crafted.bin: {len(recs)} cases (libwebp accepted)")


if __name__ == "__main__":
    sys.exit(main())
