/*
 * Foreign codec-fixture generator (VERDICT r14 ask #1: break the
 * self-encoded fixture monoculture).
 *
 * Every media payload the suite decoded through r14 was produced by the
 * repo's own encoders, so an encoder/decoder-CORRELATED spec misreading
 * (both sides agreeing on a wrong bit order, wrong predictor, wrong chroma
 * placement) was structurally invisible.  This program uses OpenJDK's
 * javax.imageio / javax.sound.sampled -- a fully independent, widely-deployed
 * codec stack -- to emit one fixture per family into tests/fixtures/foreign/:
 *
 *   gradient.png  PNG, 8-bit RGB, from a closed-form pixel pattern
 *   gradient.bmp  BMP, 24-bit BI_RGB, same pattern
 *   gradient.jpg  JPEG, baseline JFIF (Java default quality), same pattern
 *                 + gradient.jpg.decoded.bin: Java's OWN decode of that
 *                 JPEG (raw row-major RGB bytes) -- the cross-decoder oracle
 *   palette.gif   GIF, 8-entry indexed palette, closed-form index map
 *                 + palette.gif.decoded.bin: Java's own decode (RGB bytes)
 *   ramp.wav      WAV, 16-bit PCM mono 8 kHz, integer closed-form samples
 *   ramp_ulaw.wav WAV, G.711 mu-law (format 7), Java-converted from the ramp
 *   ramp_alaw.wav WAV, G.711 A-law (format 6), Java-converted from the ramp
 *
 * and a manifest.json of scalar expectations (dimensions, sha256 hexes).
 * It also decodes the reference repo's own matplotlib-emitted PNG
 * (output_97_0.png) and records Java's view of it -- dimensions, per-channel
 * sums, sha256 over row-major RGBA bytes -- so the Python test can assert
 * OUR decoder produces the bit-identical pixel array on a file neither
 * repo encoder ever touched.
 *
 * Deterministic pixel/sample formulas are re-derived independently in
 * tests/test_foreign_fixtures.py; this program never links any repo code.
 *
 *   javac GenForeignFixtures.java
 *   java GenForeignFixtures <outDir> [referencePngPath]
 */

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.awt.image.WritableRaster;
import java.io.ByteArrayInputStream;
import java.io.File;
import java.io.FileWriter;
import java.io.IOException;
import java.nio.file.Files;
import java.security.MessageDigest;
import javax.imageio.ImageIO;
import javax.sound.sampled.AudioFileFormat;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;

public class GenForeignFixtures {
    static final int W = 64, H = 40;

    static String sha256(byte[] b) throws Exception {
        MessageDigest md = MessageDigest.getInstance("SHA-256");
        StringBuilder sb = new StringBuilder();
        for (byte x : md.digest(b)) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    /** Row-major RGB bytes of an image via getRGB (sRGB, no alpha). */
    static byte[] rgbBytes(BufferedImage img) {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h * 3];
        int i = 0;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                out[i++] = (byte) ((p >> 16) & 0xff);
                out[i++] = (byte) ((p >> 8) & 0xff);
                out[i++] = (byte) (p & 0xff);
            }
        return out;
    }

    /** Row-major RGBA bytes. */
    static byte[] rgbaBytes(BufferedImage img) {
        int w = img.getWidth(), h = img.getHeight();
        byte[] out = new byte[w * h * 4];
        int i = 0;
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                out[i++] = (byte) ((p >> 16) & 0xff);
                out[i++] = (byte) ((p >> 8) & 0xff);
                out[i++] = (byte) (p & 0xff);
                out[i++] = (byte) ((p >> 24) & 0xff);
            }
        return out;
    }

    public static void main(String[] args) throws Exception {
        File outDir = new File(args[0]);
        outDir.mkdirs();
        StringBuilder js = new StringBuilder("{\n");

        // --- gradient pattern: r=(3x+7y)%256 g=(5x+11y)%256 b=(x*y)%256 ---
        BufferedImage imgA = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                int r = (3 * x + 7 * y) % 256, g = (5 * x + 11 * y) % 256, b = (x * y) % 256;
                imgA.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        byte[] srcRGB = rgbBytes(imgA);
        js.append(String.format(
            "  \"gradient\": {\"width\": %d, \"height\": %d, \"src_rgb_sha256\": \"%s\"},\n",
            W, H, sha256(srcRGB)));

        ImageIO.write(imgA, "png", new File(outDir, "gradient.png"));
        ImageIO.write(imgA, "bmp", new File(outDir, "gradient.bmp"));
        ImageIO.write(imgA, "jpg", new File(outDir, "gradient.jpg"));
        BufferedImage jBack = ImageIO.read(new File(outDir, "gradient.jpg"));
        byte[] jDec = rgbBytes(jBack);
        Files.write(new File(outDir, "gradient.jpg.decoded.bin").toPath(), jDec);
        js.append(String.format(
            "  \"gradient_jpg_java_decode\": {\"width\": %d, \"height\": %d, \"rgb_sha256\": \"%s\"},\n",
            jBack.getWidth(), jBack.getHeight(), sha256(jDec)));

        // --- smooth ramp (no mod-wrap discontinuities): JPEG cross-decoder
        // differences then reduce to IDCT/upsampling rounding, so the
        // Python-side tolerance can be tight.  r=255x/(W-1), g=255y/(H-1),
        // b=255(x+y)/(W+H-2), round-half-up.
        BufferedImage imgS = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) {
                int r = (2 * 255 * x + (W - 1)) / (2 * (W - 1));
                int g = (2 * 255 * y + (H - 1)) / (2 * (H - 1));
                int b = (2 * 255 * (x + y) + (W + H - 2)) / (2 * (W + H - 2));
                imgS.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        ImageIO.write(imgS, "jpg", new File(outDir, "smooth.jpg"));
        BufferedImage sBack = ImageIO.read(new File(outDir, "smooth.jpg"));
        byte[] sDec = rgbBytes(sBack);
        Files.write(new File(outDir, "smooth.jpg.decoded.bin").toPath(), sDec);
        js.append(String.format(
            "  \"smooth_jpg_java_decode\": {\"width\": %d, \"height\": %d, \"rgb_sha256\": \"%s\"},\n",
            sBack.getWidth(), sBack.getHeight(), sha256(sDec)));

        // --- paletted GIF: idx=(x+2y)%8, palette c_k=(37k+11, 59k+3, 83k+7)%256 ---
        byte[] pr = new byte[8], pg = new byte[8], pb = new byte[8];
        for (int k = 0; k < 8; k++) {
            pr[k] = (byte) ((37 * k + 11) % 256);
            pg[k] = (byte) ((59 * k + 3) % 256);
            pb[k] = (byte) ((83 * k + 7) % 256);
        }
        IndexColorModel icm = new IndexColorModel(3, 8, pr, pg, pb);
        BufferedImage imgG =
            new BufferedImage(W, H, BufferedImage.TYPE_BYTE_INDEXED, icm);
        WritableRaster ras = imgG.getRaster();
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++) ras.setSample(x, y, 0, (x + 2 * y) % 8);
        ImageIO.write(imgG, "gif", new File(outDir, "palette.gif"));
        BufferedImage gBack = ImageIO.read(new File(outDir, "palette.gif"));
        byte[] gDec = rgbBytes(gBack);
        Files.write(new File(outDir, "palette.gif.decoded.bin").toPath(), gDec);
        js.append(String.format(
            "  \"palette_gif_java_decode\": {\"width\": %d, \"height\": %d, \"rgb_sha256\": \"%s\"},\n",
            gBack.getWidth(), gBack.getHeight(), sha256(gDec)));

        // --- progressive JPEG: same smooth ramp through the writer's
        // progressive mode -- a foreign SOF2 bitstream (spectral selection +
        // successive approximation emitted by libjpeg's standard scan script)
        javax.imageio.ImageWriter jw =
            ImageIO.getImageWritersByFormatName("jpg").next();
        javax.imageio.ImageWriteParam jp = jw.getDefaultWriteParam();
        jp.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT);
        File progFile = new File(outDir, "smooth_progressive.jpg");
        try (javax.imageio.stream.ImageOutputStream ios =
                ImageIO.createImageOutputStream(progFile)) {
            jw.setOutput(ios);
            jw.write(null, new javax.imageio.IIOImage(imgS, null, null), jp);
        }
        jw.dispose();
        BufferedImage pBack = ImageIO.read(progFile);
        byte[] pDec = rgbBytes(pBack);
        Files.write(new File(outDir, "smooth_progressive.jpg.decoded.bin").toPath(), pDec);
        js.append(String.format(
            "  \"smooth_progressive_jpg_java_decode\": {\"width\": %d, \"height\": %d, \"rgb_sha256\": \"%s\"},\n",
            pBack.getWidth(), pBack.getHeight(), sha256(pDec)));

        // --- 16-bit greyscale PNG: g16[y][x] = (257*x*y + 41*x + 97*y) % 65536 ---
        BufferedImage img16 =
            new BufferedImage(W, H, BufferedImage.TYPE_USHORT_GRAY);
        WritableRaster r16 = img16.getRaster();
        for (int y = 0; y < H; y++)
            for (int x = 0; x < W; x++)
                r16.setSample(x, y, 0, (257 * x * y + 41 * x + 97 * y) % 65536);
        ImageIO.write(img16, "png", new File(outDir, "grey16.png"));
        js.append("  \"grey16_png\": {\"width\": " + W + ", \"height\": " + H + "},\n");

        // --- 4-bit palette BMP.  NOTE: OpenJDK's BMPImageWriter has a
        // sub-8-bit bug -- it emits ONE palette index per byte while sizing
        // rows for 4bpp, so the file's pixel payload is truncated/garbled
        // relative to the source image.  Java's OWN reader then applies the
        // spec's MSB-first nibble rule to those bytes and gets pixels that
        // differ from the source.  The fixture is still useful as a
        // READER-vs-READER check (what do these bytes mean per spec?), so we
        // dump Java's read-back as the oracle and never compare to the
        // source formula.
        ImageIO.write(imgG, "bmp", new File(outDir, "palette.bmp"));
        BufferedImage bBack = ImageIO.read(new File(outDir, "palette.bmp"));
        byte[] bDec = rgbBytes(bBack);
        Files.write(new File(outDir, "palette.bmp.decoded.bin").toPath(), bDec);
        js.append(String.format(
            "  \"palette_bmp_java_decode\": {\"width\": %d, \"height\": %d, \"rgb_sha256\": \"%s\"},\n",
            bBack.getWidth(), bBack.getHeight(), sha256(bDec)));

        // --- WAV ramp: s[i] = ((i*2057) % 20001) - 10000, 16-bit LE mono 8 kHz ---
        int N = 4000;
        byte[] pcm = new byte[N * 2];
        for (int i = 0; i < N; i++) {
            int s = ((i * 2057) % 20001) - 10000;
            pcm[2 * i] = (byte) (s & 0xff);
            pcm[2 * i + 1] = (byte) ((s >> 8) & 0xff);
        }
        AudioFormat pcmFmt = new AudioFormat(8000f, 16, 1, true, false);
        AudioSystem.write(
            new AudioInputStream(new ByteArrayInputStream(pcm), pcmFmt, N),
            AudioFileFormat.Type.WAVE, new File(outDir, "ramp.wav"));
        js.append(String.format(
            "  \"ramp_wav\": {\"rate\": 8000, \"channels\": 1, \"n_samples\": %d, \"pcm_sha256\": \"%s\"},\n",
            N, sha256(pcm)));

        // --- stereo WAV: L[i]=((i*2057)%20001)-10000, R[i]=((i*3023)%18001)-9000 ---
        int NS = 2000;
        byte[] pcm2 = new byte[NS * 4];
        for (int i = 0; i < NS; i++) {
            int l = ((i * 2057) % 20001) - 10000;
            int r = ((i * 3023) % 18001) - 9000;
            pcm2[4 * i] = (byte) (l & 0xff);
            pcm2[4 * i + 1] = (byte) ((l >> 8) & 0xff);
            pcm2[4 * i + 2] = (byte) (r & 0xff);
            pcm2[4 * i + 3] = (byte) ((r >> 8) & 0xff);
        }
        AudioFormat stFmt = new AudioFormat(8000f, 16, 2, true, false);
        AudioSystem.write(
            new AudioInputStream(new ByteArrayInputStream(pcm2), stFmt, NS),
            AudioFileFormat.Type.WAVE, new File(outDir, "ramp_stereo.wav"));
        js.append(String.format(
            "  \"ramp_stereo_wav\": {\"rate\": 8000, \"channels\": 2, \"n_frames\": %d},\n",
            NS));

        // --- G.711 variants: Java's own PCM->law converters, WAVE container ---
        for (String law : new String[] {"ULAW", "ALAW"}) {
            AudioFormat lawFmt = new AudioFormat(
                law.equals("ULAW") ? AudioFormat.Encoding.ULAW : AudioFormat.Encoding.ALAW,
                8000f, 8, 1, 1, 8000f, false);
            AudioInputStream conv = AudioSystem.getAudioInputStream(
                lawFmt,
                new AudioInputStream(new ByteArrayInputStream(pcm), pcmFmt, N));
            File f = new File(outDir, "ramp_" + law.toLowerCase() + ".wav");
            AudioSystem.write(conv, AudioFileFormat.Type.WAVE, f);
            js.append(String.format(
                "  \"ramp_%s_wav\": {\"rate\": 8000, \"channels\": 1, \"n_samples\": %d},\n",
                law.toLowerCase(), N));
        }

        // --- the reference repo's own matplotlib PNG, Java's view of it ---
        if (args.length > 1 && new File(args[1]).canRead()) {
            BufferedImage ref = ImageIO.read(new File(args[1]));
            byte[] refRGBA = rgbaBytes(ref);
            long[] sums = new long[4];
            for (int i = 0; i < refRGBA.length; i += 4)
                for (int c = 0; c < 4; c++) sums[c] += refRGBA[i + c] & 0xff;
            js.append(String.format(
                "  \"reference_png_java_decode\": {\"width\": %d, \"height\": %d, "
                    + "\"rgba_sha256\": \"%s\", \"sum_r\": %d, \"sum_g\": %d, "
                    + "\"sum_b\": %d, \"sum_a\": %d},\n",
                ref.getWidth(), ref.getHeight(), sha256(refRGBA),
                sums[0], sums[1], sums[2], sums[3]));
        }

        js.append("  \"generator\": \"OpenJDK javax.imageio/javax.sound.sampled (see GenForeignFixtures.java)\"\n}\n");
        try (FileWriter fw = new FileWriter(new File(outDir, "manifest.json"))) {
            fw.write(js.toString());
        }
        System.out.println("wrote fixtures to " + outDir);
    }
}
