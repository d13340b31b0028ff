/* avdemux — container oracle: demux any container with libavformat,
 * decode the video stream with libavcodec, write raw I420 to stdout.
 * Validates the FLV/MP4 muxers end to end (display order, like avdec).
 *
 * usage: avdemux file > out_i420
 * build: gcc -O2 tools/avdemux.c -o tools/avdemux -lavformat -lavcodec -lavutil
 */
#include <stdio.h>
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>

static int wrote = 0;

static void dump(AVFrame *f)
{
    for (int r = 0; r < f->height; r++)
        fwrite(f->data[0] + r * f->linesize[0], 1, f->width, stdout);
    for (int p = 1; p < 3; p++)
        for (int r = 0; r < f->height / 2; r++)
            fwrite(f->data[p] + r * f->linesize[p], 1, f->width / 2, stdout);
    wrote++;
}

int main(int argc, char **argv)
{
    if (argc < 2) { fprintf(stderr, "usage: avdemux file\n"); return 2; }
    AVFormatContext *fc = NULL;
    if (avformat_open_input(&fc, argv[1], NULL, NULL) < 0) {
        fprintf(stderr, "open fail\n"); return 1;
    }
    if (avformat_find_stream_info(fc, NULL) < 0) return 1;
    int vi = av_find_best_stream(fc, AVMEDIA_TYPE_VIDEO, -1, -1, NULL, 0);
    if (vi < 0) { fprintf(stderr, "no video\n"); return 1; }
    const AVCodec *codec = avcodec_find_decoder(
        fc->streams[vi]->codecpar->codec_id);
    AVCodecContext *c = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(c, fc->streams[vi]->codecpar);
    if (avcodec_open2(c, codec, NULL) < 0) return 1;

    AVPacket *pkt = av_packet_alloc();
    AVFrame *f = av_frame_alloc();
    while (av_read_frame(fc, pkt) >= 0) {
        if (pkt->stream_index == vi) {
            avcodec_send_packet(c, pkt);
            while (avcodec_receive_frame(c, f) == 0)
                dump(f);
        }
        av_packet_unref(pkt);
    }
    avcodec_send_packet(c, NULL);
    while (avcodec_receive_frame(c, f) == 0)
        dump(f);
    fprintf(stderr, "frames=%d\n", wrote);
    return 0;
}
