#!/usr/bin/env python3
"""Recover VP8's normative entropy/dequant tables (RFC 6386) from the
system libwebp's .rodata and emit src/main/scala/graft/ext/Vp8Tables.scala.

Why extraction instead of transcription: the ~3,100 normative constants
(default coefficient probabilities, their update probabilities, keyframe
B_PRED submode probabilities, dequant lookups) live in the SPEC, not the
bitstream; a from-memory transcription would silently misdecode. The
shipped libwebp.so.7 carries them in .rodata; we locate each by
STRUCTURAL signature (shape/monotonicity/value-domain — never a raw file
offset, so any build of the library works), cross-check the decoder- and
encoder-side copies agree, and accept the result only because
Vp8ConformanceSpec reproduces libwebp's own WebPDecodeYUV bit-for-bit on
libwebp-encoded fixtures (tools/make_vp8_fixtures.py).

Table shapes (RFC 6386 §13, §11.5, §14.1):
  coeff probs / update probs: [4 types][8 bands][3 ctx][11] uint8 = 1056
  keyframe B_PRED submode probs: [10 above][10 left][9] uint8 = 900
  dc_qlookup: uint8[128] monotone, 4..157
  ac_qlookup: uint16[128] monotone, 4..284
  token category extra-bit probs: cat3(3) cat4(4) cat5(5) cat6(11)
"""
import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"


def rodata(lib):
    # minimal ELF section-header walk: find .rodata's (offset, size)
    assert lib[:4] == b"\x7fELF"
    is64 = lib[4] == 2
    assert is64
    e_shoff = struct.unpack_from("<Q", lib, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", lib, 0x3A)[0]
    e_shnum = struct.unpack_from("<H", lib, 0x3C)[0]
    e_shstrndx = struct.unpack_from("<H", lib, 0x3E)[0]
    def sh(i):
        base = e_shoff + i * e_shentsize
        name, _, _, _, off, size = struct.unpack_from("<IIQQQQ", lib, base)
        return name, off, size
    _, stroff, _ = sh(e_shstrndx)
    for i in range(e_shnum):
        name, off, size = sh(i)
        end = lib.index(b"\0", stroff + name)
        if lib[stroff + name:end] == b".rodata":
            return off, size
    raise AssertionError(".rodata not found")


def zero_free_runs(buf, min_len):
    runs, i, n = [], 0, len(buf)
    while i < n:
        if buf[i]:
            j = i
            while j < n and buf[j]:
                j += 1
            if j - i >= min_len:
                runs.append((i, j - i))
            i = j
        else:
            i += 1
    return runs


def main():
    lib = open(LIB, "rb").read()
    off, size = rodata(lib)
    ro = lib[off:off + size]

    # --- dequant lookups: monotone non-decreasing, start at 4 ---
    dc = ac = None
    for base in range(0, size - 256):
        b = ro[base:base + 128]
        if b[0] == 4 and b[-1] == 157 and \
                all(b[i] <= b[i + 1] for i in range(127)):
            cand = bytes(b)
            assert dc in (None, cand), "ambiguous dc_qlookup"
            dc = cand
    for base in range(0, size - 256, 2):
        v = struct.unpack_from("<128H", ro, base)
        if v[0] == 4 and v[-1] == 284 and \
                all(v[i] <= v[i + 1] for i in range(127)):
            assert ac in (None, v), "ambiguous ac_qlookup"
            ac = v
    assert dc and ac, "dequant tables not found"

    # --- probability tables, located inside long zero-free runs
    # (probabilities are 1..255, so the three big tables are zero-free;
    # update probs are overwhelmingly 255, coeff probs' band-0 rows are
    # all-128) ---
    upd = bmodes = coeff = None
    for o, l in zero_free_runs(ro, 900):
        seg = ro[o:o + l]
        if l >= 1956 and seg[:32] == b"\xff" * 32:
            cand_upd, cand_bm = bytes(seg[:1056]), bytes(seg[1056:1956])
            assert upd in (None, cand_upd) and bmodes in (None, cand_bm), \
                "ambiguous update/bmode tables"
            upd, bmodes = cand_upd, cand_bm
        if l >= 1056 and seg[:33] == b"\x80" * 33 and seg[33] != 0x80:
            cand = bytes(seg[:1056])
            assert coeff in (None, cand), "ambiguous coeff probs"
            coeff = cand
    assert upd and bmodes and coeff, "probability tables not found"
    # sanity: the famous band-1 ctx-0 row of the default coeff probs
    assert coeff[33:39] == bytes([253, 136, 254, 255, 228, 219]), \
        "coeff probs failed the band-1 sanity row"

    # --- category extra-bit probs: zero-terminated, stored descending
    # after the zigzag ordering (pure-structure, derivable) ---
    zz = bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
    zoff = ro.index(zz)
    tail = ro[zoff + 16:zoff + 64]
    cat6 = bytes(tail[0:11]); assert tail[11] == 0
    cat5 = bytes(tail[12:17]); assert tail[17] == 0
    cat4 = bytes(tail[18:22]); assert tail[22] == 0
    cat3 = bytes(tail[23:26]); assert tail[26] == 0
    assert cat6[0] == 254 and cat3 == bytes([173, 148, 140])

    def hexs(bs):
        return "".join("%02x" % b for b in bs)

    def hexs16(vs):
        return "".join("%04x" % v for v in vs)

    def chunked(s, width=76):
        return "\n".join('      "%s" +' % s[i:i + width]
                         for i in range(0, len(s), width)).rstrip("+").rstrip()

    out = f'''package graft.ext

/** VP8's normative constant tables (RFC 6386 §13.4/§13.5, §11.5, §14.1)
  * — the ~3,100 values that live in the SPEC, not the bitstream.
  * GENERATED by tools/vp8_extract_tables.py: recovered from the system
  * libwebp's `.rodata` by STRUCTURAL signature (shape, monotonicity,
  * value domain — never a file offset), decoder/encoder copies
  * cross-checked identical, and accepted only because the in-house
  * [[Vp8Codec]] reproduces libwebp's own `WebPDecodeYUV` bit-for-bit on
  * libwebp-encoded fixtures (Vp8ConformanceSpec over
  * src/test/resources/vp8/fixtures.bin). Do not edit by hand.
  */
object Vp8Tables {{
  private def parse8(s: String): Array[Int] =
    s.grouped(2).map(Integer.parseInt(_, 16)).toArray
  private def parse16(s: String): Array[Int] =
    s.grouped(4).map(Integer.parseInt(_, 16)).toArray

  /** Default token probabilities, [4 types][8 bands][3 ctx][11] flat. */
  val coeffProbs: Array[Int] = parse8(
{chunked(hexs(coeff))})

  /** Per-probability update flags' probabilities, same shape. */
  val coeffUpdateProbs: Array[Int] = parse8(
{chunked(hexs(upd))})

  /** Keyframe B_PRED submode probabilities, [10 above][10 left][9]. */
  val kfBModeProbs: Array[Int] = parse8(
{chunked(hexs(bmodes))})

  /** DC dequantization lookup, index 0..127. */
  val dcQLookup: Array[Int] = parse8(
{chunked(hexs(dc))})

  /** AC dequantization lookup, index 0..127. */
  val acQLookup: Array[Int] = parse16(
{chunked(hexs16(ac))})

  /** Extra-bit probabilities for token categories 1..6 (cat1/cat2 are
    * spec immediates; cat3..6 recovered beside the zigzag table). */
  val cat1: Array[Int] = Array(159)
  val cat2: Array[Int] = Array(165, 145)
  val cat3: Array[Int] = Array({", ".join(map(str, cat3))})
  val cat4: Array[Int] = Array({", ".join(map(str, cat4))})
  val cat5: Array[Int] = Array({", ".join(map(str, cat5))})
  val cat6: Array[Int] = Array({", ".join(map(str, cat6))})
}}
'''
    path = "src/main/scala/graft/ext/Vp8Tables.scala"
    with open(path, "w") as f:
        f.write(out)
    print("wrote", path, ":",
          len(coeff), "coeff,", len(upd), "upd,", len(bmodes), "bmodes,",
          len(dc), "dc,", len(ac), "ac")


if __name__ == "__main__":
    sys.exit(main())
