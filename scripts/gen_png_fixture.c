/* Ground-truth PNG fixture generator (one-off; compile with
 *   gcc -O2 -o /tmp/gen_png_fixture scripts/gen_png_fixture.c -lpng
 * and run from tests/fixtures/png_gt/).
 *
 * Encodes deterministic test patterns with libpng (an encoder our
 * stdlib-zlib+numpy codec did NOT write) across the color-type /
 * bit-depth / interlace classes the round-10 decoder extension adds
 * (palette incl. tRNS, 1/2/4/16-bit, Adam7), then decodes each file
 * back with libpng using the SAME conventions the Python decoder
 * documents (strip 16 -> high byte, expand gray 1/2/4 with scaling,
 * palette -> RGB(A)) to pin reference samples.  Output: <name>.png
 * plus <name>.px ("PX\n<w> <h> <ch>\n" + raw bytes).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

/* deterministic chroma-asymmetric pattern (same idea as the JPEG one) */
static void fill_rgba(unsigned char *p, int w, int h) {
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            unsigned char *q = p + 4 * (y * w + x);
            q[0] = (unsigned char)((x * 5 + y) & 0xFF);
            q[1] = (unsigned char)((x ^ (y * 3)) & 0xFF);
            q[2] = (unsigned char)((255 - x * 2 + y * 7) & 0xFF);
            q[3] = (unsigned char)((x + y) % 3 ? 255 : (40 + x));
        }
}

static void write_png(const char *path, int w, int h, int color_type,
                      int depth, int interlace, png_colorp pal, int npal,
                      png_bytep trans, int ntrans,
                      unsigned char **rows) {
    FILE *f = fopen(path, "wb");
    if (!f) die(path);
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, 0, 0, 0);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) die("write error");
    png_init_io(png, f);
    png_set_IHDR(png, info, w, h, depth, color_type, interlace,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    if (pal) png_set_PLTE(png, info, pal, npal);
    if (trans) png_set_tRNS(png, info, trans, ntrans, 0);
    png_write_info(png, info);
    if (depth < 8) png_set_packing(png); /* we pass 1 byte per sample */
    png_write_image(png, rows);
    png_write_end(png, 0);
    png_destroy_write_struct(&png, &info);
    fclose(f);
}

static void decode_to_px(const char *pngpath, const char *pxpath) {
    FILE *f = fopen(pngpath, "rb");
    if (!f) die(pngpath);
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, 0, 0, 0);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) die("read error");
    png_init_io(png, f);
    png_read_info(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);          /* high byte */
    if (color == PNG_COLOR_TYPE_PALETTE) {
        png_set_palette_to_rgb(png);
        if (png_get_valid(png, info, PNG_INFO_tRNS))
            png_set_tRNS_to_alpha(png);
    } else if (color == PNG_COLOR_TYPE_GRAY && depth < 8) {
        png_set_expand_gray_1_2_4_to_8(png);         /* scaled */
    } else if (depth < 8) {
        png_set_packing(png);
    }
    png_set_interlace_handling(png); /* de-interlace Adam7 on read */
    png_read_update_info(png, info);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    int ch = png_get_channels(png, info);
    png_bytep *rows = malloc(h * sizeof(png_bytep));
    for (int y = 0; y < h; y++) rows[y] = malloc((size_t)w * ch);
    png_read_image(png, rows);
    png_destroy_read_struct(&png, &info, 0);
    fclose(f);
    FILE *o = fopen(pxpath, "wb");
    fprintf(o, "PX\n%d %d %d\n", w, h, ch);
    for (int y = 0; y < h; y++) { fwrite(rows[y], 1, (size_t)w * ch, o); free(rows[y]); }
    free(rows);
    fclose(o);
}

int main(void) {
    int w = 61, h = 37; /* deliberately non-multiples of 8 for Adam7 edges */
    unsigned char *rgba = malloc((size_t)4 * w * h);
    fill_rgba(rgba, w, h);
    unsigned char **rows = malloc(h * sizeof(void *));

    /* rgb8 Adam7 interlaced */
    unsigned char *rgb = malloc((size_t)3 * w * h);
    for (int i = 0; i < w * h; i++) memcpy(rgb + 3 * i, rgba + 4 * i, 3);
    for (int y = 0; y < h; y++) rows[y] = rgb + (size_t)3 * w * y;
    write_png("png_gt_rgb8_adam7.png", w, h, PNG_COLOR_TYPE_RGB, 8,
              PNG_INTERLACE_ADAM7, 0, 0, 0, 0, rows);

    /* rgba8 Adam7 interlaced */
    for (int y = 0; y < h; y++) rows[y] = rgba + (size_t)4 * w * y;
    write_png("png_gt_rgba8_adam7.png", w, h, PNG_COLOR_TYPE_RGB_ALPHA, 8,
              PNG_INTERLACE_ADAM7, 0, 0, 0, 0, rows);

    /* palette-8 with tRNS (indexes = deterministic mix) */
    png_color pal[64];
    png_byte trans[17];
    for (int i = 0; i < 64; i++) {
        pal[i].red = (png_byte)(i * 4); pal[i].green = (png_byte)(255 - i * 3);
        pal[i].blue = (png_byte)(i * 7 & 0xFF);
    }
    for (int i = 0; i < 17; i++) trans[i] = (png_byte)(i * 15);
    unsigned char *idx = malloc((size_t)w * h);
    for (int i = 0; i < w * h; i++) idx[i] = (unsigned char)((i * 13 + i / w) % 64);
    for (int y = 0; y < h; y++) rows[y] = idx + (size_t)w * y;
    write_png("png_gt_pal8_trns.png", w, h, PNG_COLOR_TYPE_PALETTE, 8,
              PNG_INTERLACE_NONE, pal, 64, trans, 17, rows);

    /* palette-4 (16 colors, no tRNS) */
    unsigned char *idx4 = malloc((size_t)w * h);
    for (int i = 0; i < w * h; i++) idx4[i] = (unsigned char)((i * 7 + 2 * (i / w)) % 16);
    for (int y = 0; y < h; y++) rows[y] = idx4 + (size_t)w * y;
    write_png("png_gt_pal4.png", w, h, PNG_COLOR_TYPE_PALETTE, 4,
              PNG_INTERLACE_NONE, pal, 16, 0, 0, rows);

    /* gray-1 (dither-ish) and gray-2 Adam7 */
    unsigned char *g1 = malloc((size_t)w * h);
    for (int i = 0; i < w * h; i++) g1[i] = (unsigned char)((i * 31 % 97) > 48);
    for (int y = 0; y < h; y++) rows[y] = g1 + (size_t)w * y;
    write_png("png_gt_gray1.png", w, h, PNG_COLOR_TYPE_GRAY, 1,
              PNG_INTERLACE_NONE, 0, 0, 0, 0, rows);
    unsigned char *g2 = malloc((size_t)w * h);
    for (int i = 0; i < w * h; i++) g2[i] = (unsigned char)(i * 31 % 4);
    for (int y = 0; y < h; y++) rows[y] = g2 + (size_t)w * y;
    write_png("png_gt_gray2_adam7.png", w, h, PNG_COLOR_TYPE_GRAY, 2,
              PNG_INTERLACE_ADAM7, 0, 0, 0, 0, rows);

    /* gray-16 (big-endian samples) */
    unsigned char *g16 = malloc((size_t)2 * w * h);
    for (int i = 0; i < w * h; i++) {
        unsigned v = (unsigned)(i * 2654435761u);
        g16[2 * i] = (unsigned char)(v >> 8 & 0xFF);
        g16[2 * i + 1] = (unsigned char)(v & 0xFF);
    }
    for (int y = 0; y < h; y++) rows[y] = g16 + (size_t)2 * w * y;
    write_png("png_gt_gray16.png", w, h, PNG_COLOR_TYPE_GRAY, 16,
              PNG_INTERLACE_NONE, 0, 0, 0, 0, rows);

    const char *stems[] = {"png_gt_rgb8_adam7", "png_gt_rgba8_adam7",
                           "png_gt_pal8_trns", "png_gt_pal4",
                           "png_gt_gray1", "png_gt_gray2_adam7",
                           "png_gt_gray16"};
    char a[128], b[128];
    for (unsigned i = 0; i < sizeof(stems) / sizeof(*stems); i++) {
        snprintf(a, sizeof a, "%s.png", stems[i]);
        snprintf(b, sizeof b, "%s.px", stems[i]);
        decode_to_px(a, b);
    }
    return 0;
}
