/* avenc — baseline encoder harness: drives the system libx264 (the same
 * X264_BUILD 164 as the reference, distro-built WITH asm) through
 * libavcodec, for honest bench.py comparisons on this host.
 *
 * usage: avenc W H fps nframes preset qp [x264-params] < raw_i420 > out.264
 * prints to stderr: encode_s=<wall seconds> bytes=<total>
 *
 * build: gcc -O2 tools/avenc.c -o tools/avenc -lavcodec -lavutil
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/imgutils.h>

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int main(int argc, char **argv) {
    if (argc < 7) {
        fprintf(stderr, "usage: avenc W H fps nframes preset qp\n");
        return 2;
    }
    int w = atoi(argv[1]), h = atoi(argv[2]);
    int fps = atoi(argv[3]), nframes = atoi(argv[4]);
    const char *preset = argv[5];
    const char *qp = argv[6];

    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) { fprintf(stderr, "no libx264\n"); return 1; }
    AVCodecContext *c = avcodec_alloc_context3(codec);
    c->width = w; c->height = h;
    c->time_base = (AVRational){1, fps};
    c->framerate = (AVRational){fps, 1};
    c->pix_fmt = AV_PIX_FMT_YUV420P;
    c->thread_count = 0;
    av_opt_set(c->priv_data, "preset", preset, 0);
    if (qp[0] == 'c' ) av_opt_set(c->priv_data, "crf", qp + 1, 0);
    else av_opt_set(c->priv_data, "qp", qp, 0);
    if (argc > 7 && argv[7][0])
        av_opt_set(c->priv_data, "x264-params", argv[7], 0);
    if (avcodec_open2(c, codec, NULL) < 0) { fprintf(stderr, "open fail\n"); return 1; }

    AVFrame *f = av_frame_alloc();
    f->format = c->pix_fmt; f->width = w; f->height = h;
    av_frame_get_buffer(f, 0);
    AVPacket *pkt = av_packet_alloc();

    size_t ysz = (size_t)w * h, csz = ysz / 4, fsz = ysz + 2 * csz;
    unsigned char *all = malloc(fsz * nframes);
    int got = 0;
    for (; got < nframes; got++)
        if (fread(all + fsz * got, 1, fsz, stdin) != fsz) break;
    nframes = got;
    long total = 0;
    double t0 = now_s();            /* all input read: time encode only */
    for (int i = 0; i < nframes; i++) {
        unsigned char *buf = all + fsz * i;
        av_frame_make_writable(f);
        for (int r = 0; r < h; r++)
            memcpy(f->data[0] + r * f->linesize[0], buf + (size_t)r * w, w);
        for (int r = 0; r < h / 2; r++) {
            memcpy(f->data[1] + r * f->linesize[1], buf + ysz + (size_t)r * w / 2, w / 2);
            memcpy(f->data[2] + r * f->linesize[2], buf + ysz + csz + (size_t)r * w / 2, w / 2);
        }
        f->pts = i;
        avcodec_send_frame(c, f);
        while (avcodec_receive_packet(c, pkt) == 0) {
            total += pkt->size;
            fwrite(pkt->data, 1, pkt->size, stdout);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(c, NULL);
    while (avcodec_receive_packet(c, pkt) == 0) {
        total += pkt->size;
        fwrite(pkt->data, 1, pkt->size, stdout);
        av_packet_unref(pkt);
    }
    double dt = now_s() - t0;
    fprintf(stderr, "encode_s=%.3f bytes=%ld\n", dt, total);
    avcodec_free_context(&c);
    return 0;
}
