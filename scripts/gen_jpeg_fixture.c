/* Ground-truth JPEG fixture generator (one-off, run by
 * scripts/gen_jpeg_fixture.sh).
 *
 * Encodes a deterministic asymmetric-color RGB test pattern with
 * libjpeg (an encoder our pure-Python codec did NOT write), then
 * decodes the produced stream back with libjpeg to pin reference
 * pixels.  Output: <name>.jpg plus <name>.ppm (P6) with libjpeg's own
 * decode of that exact stream.  The pytest compares
 * tap_airbyte_wrapper_spark.functions.jpeg.decode_jpeg against the
 * PPM — breaking the encode/decode circularity flagged in round 8
 * (complementary errors like a Cb/Cr swap in both halves of our codec
 * cannot cancel against an external encoder).
 *
 * The pattern is deliberately chroma-asymmetric: the left half ramps
 * red (Cr-heavy), the right half ramps blue (Cb-heavy), with a green
 * diagonal — a Cb/Cr swap turns left-red into left-blue and misses by
 * ~100s per channel.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void fill_pattern(unsigned char *rgb, int w, int h) {
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            unsigned char r, g, b;
            if (x < w / 2) {            /* red ramp */
                r = (unsigned char)(40 + (215 * x * 2) / w);
                g = 20; b = 30;
            } else {                     /* blue ramp */
                r = 30; g = 20;
                b = (unsigned char)(40 + (215 * (x - w / 2) * 2) / w);
            }
            if (abs(x - y) < 3) { r = 10; g = 220; b = 10; } /* diagonal */
            unsigned char *p = rgb + 3 * (y * w + x);
            p[0] = r; p[1] = g; p[2] = b;
        }
    }
}

static void encode(const char *path, unsigned char *rgb, int w, int h,
                   int quality, int h_samp, int v_samp, int restart,
                   int progressive) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr jerr;
    c.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&c);
    FILE *f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    jpeg_stdio_dest(&c, f);
    c.image_width = w; c.image_height = h;
    c.input_components = 3; c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, quality, TRUE);
    c.comp_info[0].h_samp_factor = h_samp;
    c.comp_info[0].v_samp_factor = v_samp;
    c.comp_info[1].h_samp_factor = 1;
    c.comp_info[1].v_samp_factor = 1;
    c.comp_info[2].h_samp_factor = 1;
    c.comp_info[2].v_samp_factor = 1;
    c.restart_interval = restart;
    if (progressive)
        jpeg_simple_progression(&c); /* libjpeg's standard SOF2 script:
                                        DC first+refine, per-component
                                        AC spectral bands + refines */
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = rgb + 3 * w * c.next_scanline;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    fclose(f);
    jpeg_destroy_compress(&c);
}

static void encode_gray_prog(const char *path, unsigned char *rgb,
                             int w, int h, int quality) {
    /* grayscale progressive: libjpeg converts RGB->luma itself */
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr jerr;
    c.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&c);
    FILE *f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    jpeg_stdio_dest(&c, f);
    c.image_width = w; c.image_height = h;
    c.input_components = 3; c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_colorspace(&c, JCS_GRAYSCALE);
    jpeg_set_quality(&c, quality, TRUE);
    jpeg_simple_progression(&c);
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = rgb + 3 * w * c.next_scanline;
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    fclose(f);
    jpeg_destroy_compress(&c);
}

static void decode_to_ppm(const char *jpg, const char *ppm) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr jerr;
    d.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&d);
    FILE *f = fopen(jpg, "rb");
    if (!f) { perror(jpg); exit(1); }
    jpeg_stdio_src(&d, f);
    jpeg_read_header(&d, TRUE);
    /* islow = exact integer IDCT, the reference-quality path */
    d.dct_method = JDCT_ISLOW;
    /* Pixel-replication upsampling: our decoder (and many hardware
     * paths) replicate subsampled chroma; libjpeg's default "fancy"
     * triangular interpolation is a decoder-side choice, not part of
     * the bitstream, so pin the replication variant as ground truth. */
    d.do_fancy_upsampling = FALSE;
    jpeg_start_decompress(&d);
    int w = d.output_width, h = d.output_height, nc = d.output_components;
    unsigned char *buf = malloc((size_t)w * h * nc);
    while (d.output_scanline < d.output_height) {
        JSAMPROW row = buf + (size_t)w * nc * d.output_scanline;
        jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(f);
    FILE *o = fopen(ppm, "wb");
    fprintf(o, "P%d\n%d %d\n255\n", nc == 1 ? 5 : 6, w, h);
    fwrite(buf, 1, (size_t)w * h * nc, o);
    fclose(o);
    free(buf);
}

int main(void) {
    int w = 64, h = 48;
    unsigned char *rgb = malloc((size_t)3 * w * h);
    fill_pattern(rgb, w, h);
    /* baseline: 4:4:4 q90, 4:2:0 q75, and 4:2:0 with restart markers */
    encode("jpeg_gt_444_q90.jpg", rgb, w, h, 90, 1, 1, 0, 0);
    encode("jpeg_gt_420_q75.jpg", rgb, w, h, 75, 2, 2, 0, 0);
    encode("jpeg_gt_420_rst.jpg", rgb, w, h, 80, 2, 2, 2, 0);
    decode_to_ppm("jpeg_gt_444_q90.jpg", "jpeg_gt_444_q90.ppm");
    decode_to_ppm("jpeg_gt_420_q75.jpg", "jpeg_gt_420_q75.ppm");
    decode_to_ppm("jpeg_gt_420_rst.jpg", "jpeg_gt_420_rst.ppm");
    /* progressive (SOF2, jpeg_simple_progression script): same pattern
     * through 4:4:4, 4:2:0, 4:2:0+restarts, and grayscale */
    encode("jpeg_gt_prog_444_q90.jpg", rgb, w, h, 90, 1, 1, 0, 1);
    encode("jpeg_gt_prog_420_q75.jpg", rgb, w, h, 75, 2, 2, 0, 1);
    encode("jpeg_gt_prog_420_rst.jpg", rgb, w, h, 80, 2, 2, 3, 1);
    encode_gray_prog("jpeg_gt_prog_gray_q85.jpg", rgb, w, h, 85);
    decode_to_ppm("jpeg_gt_prog_444_q90.jpg", "jpeg_gt_prog_444_q90.ppm");
    decode_to_ppm("jpeg_gt_prog_420_q75.jpg", "jpeg_gt_prog_420_q75.ppm");
    decode_to_ppm("jpeg_gt_prog_420_rst.jpg", "jpeg_gt_prog_420_rst.ppm");
    decode_to_ppm("jpeg_gt_prog_gray_q85.jpg", "jpeg_gt_prog_gray_q85.ppm");
    free(rgb);
    return 0;
}
