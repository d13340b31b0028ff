/* avdec — minimal Annex-B H.264 -> raw I420 decoder using libavcodec.
 *
 * Conformance oracle for the x264_tpu encoder: plays the role the JM
 * reference decoder plays in the reference's regression test
 * (doc/regression_test.txt): decode the bitstream and compare with the
 * encoder's own reconstruction.
 *
 * Usage: avdec in.264 out.yuv   (writes concatenated I420 frames)
 * Build: gcc -O2 -o avdec avdec.c -lavcodec -lavutil
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <libavcodec/avcodec.h>

static int write_frame(const AVFrame *f, FILE *out) {
    for (int p = 0; p < 3; p++) {
        int w = p ? f->width / 2 : f->width;
        int h = p ? f->height / 2 : f->height;
        for (int y = 0; y < h; y++)
            fwrite(f->data[p] + y * f->linesize[p], 1, w, out);
    }
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: avdec in.264 out.yuv\n"); return 2; }
    FILE *in = fopen(argv[1], "rb");
    FILE *out = fopen(argv[2], "wb");
    if (!in || !out) { perror("open"); return 2; }

    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (avcodec_open2(ctx, codec, NULL) < 0) { fprintf(stderr, "open codec failed\n"); return 1; }

    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int nframes = 0;

    #define BUF 65536
    uint8_t buf[BUF + AV_INPUT_BUFFER_PADDING_SIZE];
    size_t n;
    int eof = 0;
    uint8_t *data; size_t size = 0;
    while (!eof) {
        n = fread(buf, 1, BUF, in);
        if (n == 0) eof = 1;
        data = buf; size = n;
        while (size > 0 || eof) {
            int used = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size,
                                        data, size, AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
            if (used < 0) { fprintf(stderr, "parse error\n"); return 1; }
            data += used; size -= used;
            if (pkt->size) {
                if (avcodec_send_packet(ctx, pkt) < 0) { fprintf(stderr, "decode error\n"); return 1; }
                while (avcodec_receive_frame(ctx, frame) == 0) {
                    write_frame(frame, out); nframes++;
                }
            } else if (eof) break;
        }
        if (eof) {
            avcodec_send_packet(ctx, NULL);
            while (avcodec_receive_frame(ctx, frame) == 0) {
                write_frame(frame, out); nframes++;
            }
        }
    }
    fprintf(stderr, "decoded %d frames (%dx%d)\n", nframes, ctx->width, ctx->height);
    fclose(in); fclose(out);
    return nframes > 0 ? 0 : 1;
}
