/* Conformance shim for the from-scratch arithmetic-JPEG codec
 * (operators/jpeg_arith.py): drives the system libjpeg(-turbo) as the
 * independent ground truth.  Compiled at test time by
 * tests/test_jpeg_arith.py when gcc + jpeglib.h are present (the same
 * environment-gated pattern as the libwebp bridge); never shipped as a
 * binary.  Runs as a subprocess so libjpeg's exit()-on-fatal error
 * model cannot take the test runner down.
 *
 * Usage:
 *   jpeg_shim decode  IN.jpg OUT.raw   -> prints "W H C" on stdout,
 *                                         writes interleaved u8 rows
 *   jpeg_shim encode  IN.raw OUT.jpg W H C QUALITY ARITH PROG
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_mgr {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
};

static void err_exit(j_common_ptr cinfo) {
  struct err_mgr *e = (struct err_mgr *)cinfo->err;
  (*cinfo->err->output_message)(cinfo);
  longjmp(e->jb, 1);
}

static unsigned char *read_all(const char *path, long *n) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  *n = ftell(f);
  fseek(f, 0, SEEK_SET);
  unsigned char *buf = malloc(*n ? (size_t)*n : 1);
  if (fread(buf, 1, (size_t)*n, f) != (size_t)*n) { fclose(f); free(buf); return NULL; }
  fclose(f);
  return buf;
}

static int do_decode(const char *in, const char *out) {
  long n;
  unsigned char *jpg = read_all(in, &n);
  if (!jpg) return 2;
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return 1; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, jpg, (unsigned long)n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height, c = cinfo.output_components;
  FILE *f = fopen(out, "wb");
  if (!f) return 2;
  JSAMPROW row = malloc((size_t)w * c);
  while ((int)cinfo.output_scanline < h) {
    jpeg_read_scanlines(&cinfo, &row, 1);
    fwrite(row, 1, (size_t)w * c, f);
  }
  fclose(f);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  printf("%d %d %d\n", w, h, c);
  return 0;
}

static int do_encode(const char *in, const char *out, int w, int h, int c,
                     int quality, int arith, int prog) {
  long n;
  unsigned char *raw = read_all(in, &n);
  if (!raw || n < (long)w * h * c) return 2;
  struct jpeg_compress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_compress(&cinfo); return 1; }
  jpeg_create_compress(&cinfo);
  unsigned char *buf = NULL;
  unsigned long sz = 0;
  jpeg_mem_dest(&cinfo, &buf, &sz);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = c;
  cinfo.in_color_space = c == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  if (prog) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while ((int)cinfo.next_scanline < h) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * c;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  FILE *f = fopen(out, "wb");
  if (!f) return 2;
  fwrite(buf, 1, sz, f);
  fclose(f);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && !strcmp(argv[1], "decode"))
    return do_decode(argv[2], argv[3]);
  if (argc >= 10 && !strcmp(argv[1], "encode"))
    return do_encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                     atoi(argv[6]), atoi(argv[7]), atoi(argv[8]), atoi(argv[9]));
  fprintf(stderr, "usage: jpeg_shim decode IN OUT | encode IN OUT W H C Q ARITH PROG\n");
  return 64;
}
