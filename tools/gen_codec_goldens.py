"""Generate EXTERNAL golden fixtures for the PNG / JPEG / WAV decoders.

Round-8 verdict hygiene item: every codec except GIF was pinned only by
fixtures this repo's own encoders produced, so a mutual encoder/decoder
deviation from the spec would pass undetected. GIF got canonical
public tracking-pixel bytes; for the rest this tool uses the one real
third-party codec suite present in the container — the JDK
(javax.imageio for PNG/JPEG, javax.sound.sampled for WAV), reached
through Spark's Py4J gateway. The encoded bytes and (for lossy JPEG)
the JDK's own decode of those bytes are committed to
tests/fixtures/codec_goldens.json; tests/test_codec_goldens.py then
decodes the committed bytes with the repo decoders, no JVM needed at
test time.

Run:  python tools/gen_codec_goldens.py   (rewrites the fixture file)
"""

from __future__ import annotations

import base64
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_and_easy_vectordb_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "codec_goldens.json",
)


def pixel_pattern(w: int, h: int) -> list[list[list[int]]]:
    """Deterministic RGB pattern exercising all byte values per channel."""
    return [
        [[(x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 97 + y * 3) % 256]
         for x in range(w)]
        for y in range(h)
    ]


def main() -> None:
    spark = get_spark("qev-codec-goldens")
    jvm = spark.sparkContext._jvm

    out: dict = {}

    # ---- PNG (lossless: expected pixels == the pattern) ----
    w, h = 5, 4
    pat = pixel_pattern(w, h)
    BI = jvm.java.awt.image.BufferedImage
    img = BI(w, h, BI.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = pat[y][x]
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    png_bytes = bytes(baos.toByteArray())
    out["png"] = {
        "encoder": "JDK javax.imageio (ImageIO.write png)",
        "b64": base64.b64encode(png_bytes).decode(),
        "w": w, "h": h,
        "pixels": pat,
    }

    # ---- JPEG (lossy: expected pixels = the JDK's own decode of the
    # same bytes). Two goldens: a FLAT color — chroma is constant, so
    # the JDK's triangle-filter chroma upsample and this repo's
    # nearest-neighbor upsample agree and the comparison pins the
    # entropy-decode/dequant/IDCT path tightly — and a smooth
    # GRADIENT, where the upsample filters diverge by a bounded
    # amount (the tolerance recorded by the test). ----
    def jpeg_golden(wj, hj, pixfn):
        imgj = BI(wj, hj, BI.TYPE_INT_RGB)
        pats = []
        for y in range(hj):
            row = []
            for x in range(wj):
                r, g, b = pixfn(x, y)
                imgj.setRGB(x, y, (r << 16) | (g << 8) | b)
                row.append([r, g, b])
            pats.append(row)
        baosj = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(imgj, "jpg", baosj)
        jpg_bytes = bytes(baosj.toByteArray())
        back = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(jpg_bytes))
        jdk_pixels = []
        for y in range(hj):
            row = []
            for x in range(wj):
                rgb = back.getRGB(x, y) & 0xFFFFFF
                row.append(
                    [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF])
            jdk_pixels.append(row)
        return {
            "encoder":
                "JDK javax.imageio (ImageIO.write jpg, default quality)",
            "b64": base64.b64encode(jpg_bytes).decode(),
            "w": wj, "h": hj,
            "jdk_pixels": jdk_pixels,
        }

    out["jpeg_flat"] = jpeg_golden(16, 16, lambda x, y: (200, 30, 90))
    out["jpeg_gradient"] = jpeg_golden(
        16, 16, lambda x, y: (8 * x + 64, 8 * y + 32, 4 * (x + y) + 96))

    # ---- PROGRESSIVE JPEG (round 13): the JDK's default progression
    # is 10 scans for color (DC first+refine per component, AC bands
    # with successive approximation) and 6 for grayscale — the full
    # Annex G surface (EOBRUN, refinement correction bits, spectral
    # bands). Grayscale pins the coefficient pipeline to the IDCT ulp
    # (no chroma upsample in the comparison); the flat color one must
    # match exactly; the color gradient records the same bounded
    # upsample-filter divergence as the baseline gradient golden. ----
    def jpeg_progressive_golden(wj, hj, pixfn, gray=False):
        imgj = BI(wj, hj,
                  BI.TYPE_BYTE_GRAY if gray else BI.TYPE_INT_RGB)
        for y in range(hj):
            for x in range(wj):
                r, g, bb = pixfn(x, y)
                imgj.setRGB(x, y, (r << 16) | (g << 8) | bb)
        writer_j = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg").next()
        param_j = writer_j.getDefaultWriteParam()
        param_j.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        baosj = jvm.java.io.ByteArrayOutputStream()
        iosj = jvm.javax.imageio.ImageIO.createImageOutputStream(baosj)
        writer_j.setOutput(iosj)
        writer_j.write(None, jvm.javax.imageio.IIOImage(imgj, None, None),
                       param_j)
        iosj.flush()
        jpg_bytes = bytes(baosj.toByteArray())
        assert b"\xff\xc2" in jpg_bytes  # really SOF2
        back = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(jpg_bytes))
        jdk_pixels = []
        raster = back.getRaster()
        for y in range(hj):
            row = []
            for x in range(wj):
                if gray:
                    row.append([raster.getSample(x, y, 0)])
                else:
                    rgb = back.getRGB(x, y) & 0xFFFFFF
                    row.append([(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF,
                                rgb & 0xFF])
            jdk_pixels.append(row)
        return {
            "encoder": "JDK javax.imageio (jpg, MODE_DEFAULT "
                       "progressive)",
            "b64": base64.b64encode(jpg_bytes).decode(),
            "w": wj, "h": hj,
            "jdk_pixels": jdk_pixels,
        }

    out["jpeg_progressive_gray"] = jpeg_progressive_golden(
        40, 33,
        lambda x, y: ((x * x * 7 + y * y * 13 + x * y) % 256,) * 3,
        gray=True)
    out["jpeg_progressive_flat"] = jpeg_progressive_golden(
        16, 16, lambda x, y: (200, 30, 90))
    out["jpeg_progressive_gradient"] = jpeg_progressive_golden(
        16, 16, lambda x, y: (8 * x + 64, 8 * y + 32, 4 * (x + y) + 96))

    # ---- TIFF (lossless: expected pixels == the pattern). The JDK
    # writer emits big-endian ("MM") strip-layout TIFF; PackBits is
    # requested explicitly so the golden pins the RLE decode path
    # against a third-party encoder, not just this repo's own. ----
    wt, ht = 9, 7
    patt = pixel_pattern(wt, ht)
    imgt = BI(wt, ht, BI.TYPE_INT_RGB)
    for y in range(ht):
        for x in range(wt):
            r, g, b = patt[y][x]
            imgt.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("PackBits")
    baost = jvm.java.io.ByteArrayOutputStream()
    iost = jvm.javax.imageio.ImageIO.createImageOutputStream(baost)
    writer.setOutput(iost)
    writer.write(None, jvm.javax.imageio.IIOImage(imgt, None, None),
                 param)
    iost.flush()
    tiff_bytes = bytes(baost.toByteArray())
    assert tiff_bytes[:4] == b"MM\x00*"
    out["tiff_packbits"] = {
        "encoder": "JDK javax.imageio (TIFFImageWriter, PackBits)",
        "b64": base64.b64encode(tiff_bytes).decode(),
        "w": wt, "h": ht,
        "pixels": patt,
    }

    # ---- TIFF LZW (same writer, LZW compression): a 32x32 RGB
    # pattern produces ~2000 table entries, crossing both the 511 and
    # 1023 early-change width boundaries — the exact timing the
    # TIFF-variant LZW decoder must get right. ----
    wl, hl = 32, 32
    patl = pixel_pattern(wl, hl)
    imgl = BI(wl, hl, BI.TYPE_INT_RGB)
    for y in range(hl):
        for x in range(wl):
            r, g, b = patl[y][x]
            imgl.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer_l = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff").next()
    param_l = writer_l.getDefaultWriteParam()
    param_l.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param_l.setCompressionType("LZW")
    baosl = jvm.java.io.ByteArrayOutputStream()
    iosl = jvm.javax.imageio.ImageIO.createImageOutputStream(baosl)
    writer_l.setOutput(iosl)
    writer_l.write(None, jvm.javax.imageio.IIOImage(imgl, None, None),
                   param_l)
    iosl.flush()
    tiff_lzw_bytes = bytes(baosl.toByteArray())
    out["tiff_lzw"] = {
        "encoder": "JDK javax.imageio (TIFFImageWriter, LZW)",
        "b64": base64.b64encode(tiff_lzw_bytes).decode(),
        "w": wl, "h": hl,
        "pixels": patl,
    }

    # ---- WAV (PCM 16-bit: expected samples exact) ----
    samples = [((i * 2731 + 17) % 65536) - 32768 for i in range(64)]
    raw = b"".join(struct.pack("<h", s) for s in samples)
    fmt = jvm.javax.sound.sampled.AudioFormat(8000.0, 16, 1, True, False)
    ais = jvm.javax.sound.sampled.AudioInputStream(
        jvm.java.io.ByteArrayInputStream(raw), fmt, len(samples))
    baosw = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.sound.sampled.AudioSystem.write(
        ais, jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE, baosw)
    wav_bytes = bytes(baosw.toByteArray())
    out["wav"] = {
        "encoder": "JDK javax.sound.sampled (AudioSystem.write WAVE)",
        "b64": base64.b64encode(wav_bytes).decode(),
        "rate": 8000, "channels": 1,
        "samples": samples,
    }

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    jpeg_len = len(base64.b64decode(out["jpeg_flat"]["b64"]))
    print(f"wrote {OUT}: "
          f"png {len(png_bytes)}B, jpeg {jpeg_len}B, "
          f"tiff {len(tiff_bytes)}B, wav {len(wav_bytes)}B")


if __name__ == "__main__":
    main()
