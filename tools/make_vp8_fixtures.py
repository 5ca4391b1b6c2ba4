#!/usr/bin/env python3
"""Generate VP8 conformance fixtures: deterministic RGB images encoded by
the SYSTEM libwebp (WebPEncodeRGB) with ground-truth YUV planes from the
same library's own decoder (WebPDecodeYUV). Vp8ConformanceSpec then
requires the in-house graft Vp8Codec to reproduce every plane
BIT-FOR-BIT — that end-to-end check is what validates the .rodata table
recovery in tools/vp8_extract_tables.py (a wrong table diverges the
arithmetic decoder catastrophically, so bit-exactness across diverse
content/size/quality is a conformance proof, not a similarity score).

Output: src/test/resources/vp8/fixtures.bin, little-endian:
  magic "VP8FIX01", i32 count, then per fixture:
    i32 name_len, name utf-8
    i32 webp_len, webp bytes
    i32 w, i32 h
    y plane (w*h), u plane (cw*ch), v plane (cw*ch)  [cw=(w+1)/2 ...]
"""
import ctypes
import struct
import sys

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.restype = None
lib.WebPFree.argtypes = [ctypes.c_void_p]


def encode(rgb, w, h, quality):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, 3 * w,
                          ctypes.c_float(quality), ctypes.byref(out))
    assert n > 0, "encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "decode failed"
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = bytearray()
    for r in range(H):
        yp += ctypes.string_at(ctypes.addressof(y.contents) +
                               r * stride.value, W)
    up = bytearray(); vp = bytearray()
    for r in range(ch):
        up += ctypes.string_at(ctypes.addressof(u.contents) +
                               r * uv_stride.value, cw)
        vp += ctypes.string_at(ctypes.addressof(v.contents) +
                               r * uv_stride.value, cw)
    lib.WebPFree(y)
    return W, H, bytes(yp), bytes(up), bytes(vp)


def lcg(seed):
    s = seed & 0xffffffff
    while True:
        s = (s * 1664525 + 1013904223) & 0xffffffff
        yield (s >> 16) & 0xff


def synth(kind, w, h, seed):
    """Deterministic RGB content, chosen to drive distinct coder paths:
    gradients (DC/WHT-heavy), checkers (AC edges), noise (large tokens,
    cat3..6), mixed (segmentation), flat (skip path)."""
    rgb = bytearray(3 * w * h)
    rnd = lcg(seed)
    for y in range(h):
        for x in range(w):
            i = 3 * (y * w + x)
            if kind == "grad":
                rgb[i] = (x * 255 // max(w - 1, 1))
                rgb[i + 1] = (y * 255 // max(h - 1, 1))
                rgb[i + 2] = (x + y + seed) % 256
            elif kind == "checker":
                c = 255 if ((x // 4) + (y // 4)) % 2 == 0 else 0
                rgb[i] = c; rgb[i + 1] = 255 - c; rgb[i + 2] = (c + seed) % 256
            elif kind == "noise":
                rgb[i] = next(rnd); rgb[i + 1] = next(rnd); rgb[i + 2] = next(rnd)
            elif kind == "mixed":
                if x < w // 2:
                    rgb[i] = rgb[i + 1] = rgb[i + 2] = (2 * x + seed) % 256
                else:
                    rgb[i] = next(rnd); rgb[i + 1] = next(rnd); rgb[i + 2] = next(rnd)
            else:  # flat
                rgb[i] = (seed * 37) % 256
                rgb[i + 1] = (seed * 59) % 256
                rgb[i + 2] = (seed * 83) % 256
    return bytes(rgb)


def main():
    fixtures = []
    dims = [(1, 1), (3, 5), (16, 16), (17, 13), (33, 21), (48, 48),
            (64, 48), (81, 63), (128, 96)]
    kinds = ["grad", "checker", "noise", "mixed", "flat"]
    qualities = [5.0, 25.0, 50.0, 75.0, 92.0]
    seed = 1
    for (w, h) in dims:
        for kind in kinds:
            # one quality per (dims, kind), rotating so every quality
            # meets every kind and every size class somewhere
            q = qualities[(seed + w + h) % len(qualities)]
            rgb = synth(kind, w, h, seed)
            webp = encode(rgb, w, h, q)
            W, H, yp, up, vp = decode_yuv(webp)
            assert (W, H) == (w, h)
            fixtures.append((f"{kind}_{w}x{h}_q{int(q)}", webp, W, H, yp, up, vp))
            seed += 1
    # quality sweep on one noisy mid-size image: drives the dequant
    # index range (incl. the chroma-DC 132 clamp at the low end)
    for q in [0.0, 10.0, 30.0, 60.0, 80.0, 99.0]:
        rgb = synth("mixed", 49, 37, 77)
        webp = encode(rgb, 49, 37, q)
        W, H, yp, up, vp = decode_yuv(webp)
        fixtures.append((f"sweep_49x37_q{int(q)}", webp, W, H, yp, up, vp))

    out = bytearray(b"VP8FIX01")
    out += struct.pack("<i", len(fixtures))
    for name, webp, W, H, yp, up, vp in fixtures:
        nb = name.encode()
        out += struct.pack("<i", len(nb)) + nb
        out += struct.pack("<i", len(webp)) + webp
        out += struct.pack("<ii", W, H) + yp + up + vp
    import os
    os.makedirs("src/test/resources/vp8", exist_ok=True)
    path = "src/test/resources/vp8/fixtures.bin"
    with open(path, "wb") as f:
        f.write(out)
    print(f"wrote {path}: {len(fixtures)} fixtures, {len(out)} bytes")


if __name__ == "__main__":
    sys.exit(main())
