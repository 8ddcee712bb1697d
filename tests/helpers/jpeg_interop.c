/* Test-only interop helper: encodes PNM -> JPEG and decodes JPEG -> PNM
 * through the SYSTEM libjpeg, so the repo's from-spec Python codec can
 * be differentially tested against an independent implementation.
 * Modes: enc <in.pnm> <out.jpg> <quality> <arith> <subsample> <progressive> [restart]
 *        dec <in.jpg> <out.pnm>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

int main(int argc, char **argv) {
    if (argc < 4) die("usage");
    if (!strcmp(argv[1], "enc")) {
        if (argc < 8) die("usage enc");
        FILE *fi = fopen(argv[2], "rb"), *fo = fopen(argv[3], "wb");
        if (!fi || !fo) die("open");
        int quality = atoi(argv[4]), arith = atoi(argv[5]);
        int sub = atoi(argv[6]), prog = atoi(argv[7]);
        int rst = argc > 8 ? atoi(argv[8]) : 0;
        char magic[3] = {0};
        int w, h, maxv;
        if (fscanf(fi, "%2s %d %d %d", magic, &w, &h, &maxv) != 4)
            die("pnm hdr");
        fgetc(fi);
        int nc = !strcmp(magic, "P6") ? 3 : 1;
        size_t n = (size_t)w * h * nc;
        unsigned char *buf = malloc(n);
        if (fread(buf, 1, n, fi) != n) die("pnm body");
        struct jpeg_compress_struct c;
        struct jpeg_error_mgr err;
        c.err = jpeg_std_error(&err);
        jpeg_create_compress(&c);
        jpeg_stdio_dest(&c, fo);
        c.image_width = w;
        c.image_height = h;
        c.input_components = nc;
        c.in_color_space = nc == 3 ? JCS_RGB : JCS_GRAYSCALE;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, quality, TRUE);
        c.arith_code = arith ? TRUE : FALSE;
        c.restart_interval = rst;
        if (nc == 3) {
            c.comp_info[0].h_samp_factor = sub ? 2 : 1;
            c.comp_info[0].v_samp_factor = sub ? 2 : 1;
            c.comp_info[1].h_samp_factor = 1;
            c.comp_info[1].v_samp_factor = 1;
            c.comp_info[2].h_samp_factor = 1;
            c.comp_info[2].v_samp_factor = 1;
        }
        if (prog) jpeg_simple_progression(&c);
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = buf + (size_t)c.next_scanline * w * nc;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c);
        jpeg_destroy_compress(&c);
        fclose(fi);
        fclose(fo);
    } else if (!strcmp(argv[1], "dec")) {
        FILE *fi = fopen(argv[2], "rb"), *fo = fopen(argv[3], "wb");
        if (!fi || !fo) die("open");
        struct jpeg_decompress_struct d;
        struct jpeg_error_mgr err;
        d.err = jpeg_std_error(&err);
        jpeg_create_decompress(&d);
        jpeg_stdio_src(&d, fi);
        jpeg_read_header(&d, TRUE);
        jpeg_start_decompress(&d);
        int w = d.output_width, h = d.output_height, nc = d.output_components;
        fprintf(fo, "%s\n%d %d\n255\n", nc == 3 ? "P6" : "P5", w, h);
        unsigned char *row = malloc((size_t)w * nc);
        while ((int)d.output_scanline < h) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&d, &r, 1);
            fwrite(row, 1, (size_t)w * nc, fo);
        }
        jpeg_finish_decompress(&d);
        jpeg_destroy_decompress(&d);
        fclose(fi);
        fclose(fo);
    } else {
        die("mode");
    }
    return 0;
}
