/* Standalone CLI driver for the hartallo reference library (oracle for the
 * TPU rebuild). Usage:
 *   ref_driver decode <in.264> <out.yuv> [threads]
 *   ref_driver encode <in.yuv> <W> <H> <out.264> [qp] [gop] [nframes] [threads] [me_range] [deblock]
 * Prints one JSON line with timing. */
#include <hartallo/hl_api.h>
#include <hartallo/hl_memory.h>
#include <hartallo/hl_debug.h>
#include <hartallo/hl_object.h>
#include <hartallo/hl_cpu.h>
#include <hartallo/hl_time.h>
#include <hartallo/hl_frame.h>
#include <hartallo/hl_codec.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int quiet_dbg(int level, const void* arg, const char* fmt, ...) { (void)level; (void)arg; (void)fmt; return 0; }

static int do_decode(const char* inpath, const char* outpath, int threads)
{
    int dqid_min = -1, dqid_max = -1;
    const char* e1 = getenv("REF_DQID_MIN");
    const char* e2 = getenv("REF_DQID_MAX");
    if (e1) dqid_min = atoi(e1);
    if (e2) dqid_max = atoi(e2);
    HL_ERROR_T err;
    FILE* fi = fopen(inpath, "rb");
    FILE* fo = fopen(outpath, "wb");
    if (!fi || !fo) { fprintf(stderr, "open failed\n"); return 1; }
    fseek(fi, 0, SEEK_END); long sz = ftell(fi); fseek(fi, 0, SEEK_SET);
    uint8_t* buf = (uint8_t*)hl_memory_calloc(sz + 64, 1);
    if (fread(buf, 1, sz, fi) != (size_t)sz) { return 1; }
    fclose(fi);
    /* sentinel start code so the parser terminates the last NAL cleanly */
    buf[sz] = 0x00; buf[sz+1] = 0x00; buf[sz+2] = 0x01; buf[sz+3] = 0x0C; /* end-of-stream NAL */
    sz += 4;

    const struct hl_parser_plugin_def_s* pp; struct hl_parser_s* parser;
    const struct hl_codec_plugin_def_s* cp; struct hl_codec_s* codec;
    struct hl_codec_result_s* result;
    if (hl_parser_plugin_find(HL_CODEC_TYPE_H264_SVC, &pp)) return 2;
    if (hl_parser_create(pp, &parser)) return 2;
    if (hl_codec_plugin_find(HL_CODEC_TYPE_H264_SVC, &cp)) return 2;
    if (hl_codec_create(cp, &codec)) return 2;
    if (hl_codec_result_create(&result)) return 2;
    codec->threads_count = threads;
    codec->dqid_min = dqid_min; codec->dqid_max = dqid_max;

    uint64_t t0 = hl_time_now();
    hl_size_t nal_start, nal_end;
    uint8_t* p = buf; long count = sz; long frames = 0;
    while (count > 4 && (err = hl_parser_find_bounds(parser, p, count, &nal_start, &nal_end)) == HL_ERROR_SUCCESS) {
        err = hl_codec_decode(codec, &p[nal_start], (nal_end - nal_start + 1), result);
        if (result->type & HL_CODEC_RESULT_TYPE_DATA) {
            fwrite(result->data_ptr, 1, result->data_size, fo);
            frames++;
        }
        p += nal_end; count -= nal_end;
    }
    uint64_t t1 = hl_time_now();
    fclose(fo);
    printf("{\"op\":\"decode\",\"frames\":%ld,\"ms\":%llu,\"fps\":%.2f}\n",
           frames, (unsigned long long)(t1 - t0), frames * 1000.0 / (double)(t1 - t0 ? t1 - t0 : 1));
    return 0;
}

static int do_encode(const char* inpath, int W, int H, const char* outpath,
                     int qp, int gop, int nframes, int threads, int me_range, int deblock)
{
    static const uint8_t SCP[3] = { 0x00, 0x00, 0x01 };
    FILE* fi = fopen(inpath, "rb");
    FILE* fo = fopen(outpath, "wb");
    if (!fi || !fo) { fprintf(stderr, "open failed\n"); return 1; }
    size_t ysz = (size_t)W * H, fsz = ysz * 3 / 2;
    uint8_t* yuv = (uint8_t*)malloc(fsz);

    const struct hl_codec_plugin_def_s* cp; struct hl_codec_s* codec;
    struct hl_codec_result_s* result; hl_frame_video_t* frame;
    if (hl_codec_plugin_find(HL_CODEC_TYPE_H264_SVC, &cp)) return 2;
    if (hl_codec_create(cp, &codec)) return 2;
    if (hl_codec_result_create(&result)) return 2;
    if (hl_frame_video_create(&frame)) return 2;

    codec->gop_size = gop;
    codec->me_range = me_range;
    codec->qp = qp;
    codec->fps.num = 1; codec->fps.den = 30;
    codec->rc_bitrate = -1;
    codec->deblock_flag = deblock;
    codec->threads_count = threads;
    codec->distortion_mesure_type = HL_VIDEO_DISTORTION_MESURE_TYPE_SAD;
    codec->me_type = (HL_VIDEO_ME_TYPE_INTEGER | HL_VIDEO_ME_TYPE_HALF | HL_VIDEO_ME_TYPE_QUATER);
    codec->me_part_types = HL_VIDEO_ME_PART_TYPE_ALL;
    codec->me_subpart_types = HL_VIDEO_ME_SUBPART_TYPE_ALL;
    codec->me_early_term_flag = 0;

    uint64_t t0 = hl_time_now();
    int n = 0;
    while (n < nframes && fread(yuv, 1, fsz, fi) == fsz) {
        if (hl_frame_video_fill(frame, HL_VIDEO_CHROMA_YUV420, W, H, yuv, fsz)) return 3;
        frame->encoding = HL_VIDEO_ENCODING_TYPE_AUTO;
        if (hl_codec_encode(codec, (hl_frame_t*)frame, result)) return 3;
        if (result->type & HL_CODEC_RESULT_TYPE_HDR) {
            fwrite(codec->hdr_bytes, 1, codec->hdr_bytes_count, fo);
        }
        if (result->type & HL_CODEC_RESULT_TYPE_DATA) {
            fwrite(SCP, 1, 3, fo);
            fwrite(result->data_ptr, 1, result->data_size, fo);
            n++;
        }
    }
    uint64_t t1 = hl_time_now();
    fclose(fi); fclose(fo);
    printf("{\"op\":\"encode\",\"frames\":%d,\"ms\":%llu,\"fps\":%.2f}\n",
           n, (unsigned long long)(t1 - t0), n * 1000.0 / (double)(t1 - t0 ? t1 - t0 : 1));
    return 0;
}

static int do_encode_svc(const char* in0, int W0, int H0,
                         const char* in1, int W1, int H1,
                         const char* outpath, int qp, int gop, int nframes)
{
    static const uint8_t SCP[3] = { 0x00, 0x00, 0x01 };
    FILE* f0 = fopen(in0, "rb");
    FILE* f1 = fopen(in1, "rb");
    FILE* fo = fopen(outpath, "wb");
    if (!f0 || !f1 || !fo) { fprintf(stderr, "open failed\n"); return 1; }
    size_t sz0 = (size_t)W0 * H0 * 3 / 2, sz1 = (size_t)W1 * H1 * 3 / 2;
    uint8_t* b0 = (uint8_t*)malloc(sz0);
    uint8_t* b1 = (uint8_t*)malloc(sz1);

    const struct hl_codec_plugin_def_s* cp; struct hl_codec_s* codec;
    struct hl_codec_result_s* result; hl_frame_video_t* frame;
    if (hl_codec_plugin_find(HL_CODEC_TYPE_H264_SVC, &cp)) return 2;
    if (hl_codec_create(cp, &codec)) return 2;
    if (hl_codec_result_create(&result)) return 2;
    if (hl_frame_video_create(&frame)) return 2;

    codec->gop_size = gop;
    codec->me_range = 8;
    codec->qp = qp;
    codec->fps.num = 1; codec->fps.den = 30;
    codec->rc_bitrate = -1;
    codec->deblock_flag = 0;
    codec->threads_count = 1;
    codec->distortion_mesure_type = HL_VIDEO_DISTORTION_MESURE_TYPE_SAD;
    codec->me_type = (HL_VIDEO_ME_TYPE_INTEGER | HL_VIDEO_ME_TYPE_HALF | HL_VIDEO_ME_TYPE_QUATER);
    codec->me_part_types = HL_VIDEO_ME_PART_TYPE_ALL;
    codec->me_subpart_types = HL_VIDEO_ME_SUBPART_TYPE_ALL;
    codec->me_early_term_flag = 0;

    if (hl_codec_add_layer(codec, W0, H0, 0, 0)) return 2;
    if (hl_codec_add_layer(codec, W1, H1, 0, 0)) return 2;

    int n = 0;
    while (n < nframes && fread(b0, 1, sz0, f0) == sz0 &&
           fread(b1, 1, sz1, f1) == sz1) {
        if (hl_frame_video_fill(frame, HL_VIDEO_CHROMA_YUV420, W0, H0, b0, sz0)) return 3;
        frame->encoding = HL_VIDEO_ENCODING_TYPE_AUTO;
        if (hl_codec_encode(codec, (hl_frame_t*)frame, result)) return 3;
        if (result->type & HL_CODEC_RESULT_TYPE_HDR)
            fwrite(codec->hdr_bytes, 1, codec->hdr_bytes_count, fo);
        if (result->type & HL_CODEC_RESULT_TYPE_DATA) {
            fwrite(SCP, 1, 3, fo);
            fwrite(result->data_ptr, 1, result->data_size, fo);
        }
        if (hl_frame_video_fill(frame, HL_VIDEO_CHROMA_YUV420, W1, H1, b1, sz1)) return 3;
        frame->encoding = HL_VIDEO_ENCODING_TYPE_AUTO;
        if (hl_codec_encode(codec, (hl_frame_t*)frame, result)) return 3;
        if (result->type & HL_CODEC_RESULT_TYPE_HDR)
            fwrite(codec->hdr_bytes, 1, codec->hdr_bytes_count, fo);
        if (result->type & HL_CODEC_RESULT_TYPE_DATA) {
            fwrite(SCP, 1, 3, fo);
            fwrite(result->data_ptr, 1, result->data_size, fo);
            n++;
        }
    }
    fclose(f0); fclose(f1); fclose(fo);
    printf("{\"op\":\"encode_svc\",\"frames\":%d}\n", n);
    return 0;
}

int main(int argc, char** argv)
{
    if (argc < 2) { fprintf(stderr, "usage: decode|encode ...\n"); return 1; }
    if (!getenv("REF_VERBOSE")) hl_debug_set_cb(quiet_dbg);
    if (hl_engine_init()) { fprintf(stderr, "engine init failed\n"); return 1; }
    if (getenv("REF_NO_SIMD")) {
        /* portable-C kernels only: the reference's own tests note that its
         * SIMD interpolation clips differently from the C path */
        if (hl_engine_set_cpu_flags(0)) { return 1; }
    }
    if (!strcmp(argv[1], "decode")) {
        if (argc < 4) return 1;
        return do_decode(argv[2], argv[3], argc > 4 ? atoi(argv[4]) : 1);
    } else if (!strcmp(argv[1], "encsvc")) {
        if (argc < 12) return 1;
        return do_encode_svc(argv[2], atoi(argv[3]), atoi(argv[4]),
                             argv[5], atoi(argv[6]), atoi(argv[7]),
                             argv[8], atoi(argv[9]), atoi(argv[10]),
                             atoi(argv[11]));
    } else if (!strcmp(argv[1], "encode")) {
        if (argc < 6) return 1;
        int W = atoi(argv[3]), H = atoi(argv[4]);
        int qp = argc > 6 ? atoi(argv[6]) : 31;
        int gop = argc > 7 ? atoi(argv[7]) : 30;
        int nf = argc > 8 ? atoi(argv[8]) : 1000000;
        int th = argc > 9 ? atoi(argv[9]) : 1;
        int mer = argc > 10 ? atoi(argv[10]) : 16;
        int dbf = argc > 11 ? atoi(argv[11]) : 1;
        return do_encode(argv[2], W, H, argv[5], qp, gop, nf, th, mer, dbf);
    }
    return 1;
}
