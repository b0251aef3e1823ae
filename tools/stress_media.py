"""Throughput evidence for the media frame-sampling pipeline at scale.

The gif/video_frame_sample driver queries run on fixed small slices
(oracle-checkable); the 100 TB question is decoder THROUGHPUT: how many
real containers per second does the Arrow-batched mapInPandas path
decode when the corpus is large? This harness synthesizes N animated
GIFs and N DIB AVIs inside executors (4 frames each), decodes them
with the real codecs, takes the per-frame perceptual dHash (the image
near-dup fingerprint), and reduces to one count — binaries and frames
never leave the executors.

Usage: python tools/stress_media.py [N]   (default 100_000)
Prints one JSON line with containers/s and frames/s per format.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FRAMES = 4
H, W = 16, 18  # dHash-compatible grid (H%8==0, W%9==0)


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from vearch_spark.functions.media import (
        avi_bytes,
        decode_avi,
        decode_gif,
        dhash64,
        gif_bytes,
    )
    from vearch_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="media-stress")
    ids = spark.range(n).select(F.col("id").alias("doc_id")).repartition(32)

    def synth(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                rng = np.random.default_rng(i)
                pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
                stack = rng.integers(0, 16, (FRAMES, H, W), dtype=np.uint8)
                rgb = pal[stack.astype(np.int64)]
                rows.append(
                    (i, gif_bytes(stack, pal), avi_bytes(rgb, codec="DIB"))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "gif", "avi"])

    media = ids.mapInPandas(
        synth, schema="doc_id long, gif binary, avi binary"
    ).persist()
    media.count()  # materialize synthesis OUTSIDE the timed decode

    def run(col, decoder):
        def sample(batches):
            for pdf in batches:
                out = []
                for i, blob in zip(pdf["doc_id"], pdf[col]):
                    frames = decoder(bytes(blob))
                    hs = [int(dhash64(f[..., :3])) for f in frames]
                    out.append((int(i), len(hs), hs[0]))
                yield pd.DataFrame(out, columns=["doc_id", "nf", "h0"])

        t0 = time.time()
        got = media.mapInPandas(
            sample, schema="doc_id long, nf int, h0 long"
        ).agg(F.count("*"), F.sum("nf")).collect()[0]
        dt = time.time() - t0
        assert got[0] == n and got[1] == n * FRAMES
        return round(n / dt, 1), round(n * FRAMES / dt, 1)

    gif_cps, gif_fps = run("gif", decode_gif)
    avi_cps, avi_fps = run("avi", decode_avi)
    media.unpersist()
    print(
        json.dumps(
            {
                "n": n,
                "frames_per_container": FRAMES,
                "gif_containers_per_s": gif_cps,
                "gif_frames_per_s": gif_fps,
                "avi_containers_per_s": avi_cps,
                "avi_frames_per_s": avi_fps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
