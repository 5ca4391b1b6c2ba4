#!/usr/bin/env python3
"""Debug aid: re-decode the VP8 fixtures with libwebp's advanced API and
bypass_filtering=1, writing fixtures_nofilter.bin in the same format.
Lets the conformance debugging separate reconstruction bugs from loop-
filter bugs (the committed spec always runs against the FILTERED truth).
"""
import ctypes
import struct

lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")

MODE_YUV = 11
ABI = 0x0209


class WebPBitstreamFeatures(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class WebPYUVABuffer(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class U(ctypes.Union):
    _fields_ = [("YUVA", WebPYUVABuffer), ("pad", ctypes.c_uint8 * 80)]


class WebPDecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int), ("is_external_memory", ctypes.c_int),
                ("u", U), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.c_void_p)]


class WebPDecoderOptions(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int),
                ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
                ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
                ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class WebPDecoderConfig(ctypes.Structure):
    _fields_ = [("input", WebPBitstreamFeatures),
                ("output", WebPDecBuffer),
                ("options", WebPDecoderOptions)]


lib.WebPInitDecoderConfigInternal.restype = ctypes.c_int
lib.WebPDecode.restype = ctypes.c_int
lib.WebPFreeDecBuffer.restype = None


def decode_nofilter(data):
    cfg = WebPDecoderConfig()
    assert lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), ABI) == 1, \
        "ABI mismatch"
    cfg.options.bypass_filtering = 1
    cfg.output.colorspace = MODE_YUV
    rc = lib.WebPDecode(data, len(data), ctypes.byref(cfg))
    assert rc == 0, f"decode rc={rc}"
    W, H = cfg.output.width, cfg.output.height
    yb = cfg.output.u.YUVA
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = bytearray()
    for r in range(H):
        yp += ctypes.string_at(ctypes.addressof(yb.y.contents) +
                               r * yb.y_stride, W)
    up = bytearray(); vp = bytearray()
    for r in range(ch):
        up += ctypes.string_at(ctypes.addressof(yb.u.contents) +
                               r * yb.u_stride, cw)
        vp += ctypes.string_at(ctypes.addressof(yb.v.contents) +
                               r * yb.v_stride, cw)
    lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return W, H, bytes(yp), bytes(up), bytes(vp)


def main():
    raw = open("src/test/resources/vp8/fixtures.bin", "rb").read()
    assert raw[:8] == b"VP8FIX01"
    n = struct.unpack_from("<i", raw, 8)[0]
    pos = 12
    out = bytearray(b"VP8FIX01") + struct.pack("<i", n)
    for _ in range(n):
        nl = struct.unpack_from("<i", raw, pos)[0]; pos += 4
        name = raw[pos:pos + nl]; pos += nl
        wl = struct.unpack_from("<i", raw, pos)[0]; pos += 4
        webp = raw[pos:pos + wl]; pos += wl
        w, h = struct.unpack_from("<ii", raw, pos); pos += 8
        cw, ch = (w + 1) // 2, (h + 1) // 2
        pos += w * h + 2 * cw * ch  # skip filtered planes
        W, H, yp, up, vp = decode_nofilter(bytes(webp))
        assert (W, H) == (w, h)
        out += struct.pack("<i", nl) + name
        out += struct.pack("<i", wl) + webp
        out += struct.pack("<ii", W, H) + yp + up + vp
    with open("/tmp/fixtures_nofilter.bin", "wb") as f:
        f.write(out)
    print(f"wrote /tmp/fixtures_nofilter.bin ({n} fixtures)")


if __name__ == "__main__":
    main()
