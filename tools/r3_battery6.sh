#!/bin/bash
# Round-3 battery 6: e2e wall-clock breakdown. The honest file->CSVs number
# (1.32 clips/s) sits 13x under the decode ceiling (17.6 clips/s) now that
# decode-at-target landed; device compute is ~0.15 s/batch. Suspect: the
# ~313 MB/video host->device frame upload over the tunnel. Measure:
#   1. raw upload bandwidth (uint8 frames, production batch shape)
#   2. per-stage e2e breakdown (decode / upload / compute / readback / csv)
# Polls the tunnel with a 120 s probe until it comes back, then runs.
cd /root/repo
log=/tmp/r3_battery6.log
echo "=== battery6 start $(date)" >> $log
until timeout 120 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
jax.devices(); float(jnp.sum(jnp.ones((8,128))))" >/dev/null 2>&1; do
  echo "[probe] tunnel down $(date)" >> $log
  sleep 180
done
echo "=== tunnel up $(date)" >> $log

echo "=== upload bandwidth" >> $log
for i in 1 2; do
  timeout 900 env PYTHONPATH=/root/repo:/root/.axon_site python - >> $log 2>&1 <<'EOF' && break
import time, numpy as np, jax, jax.numpy as jnp
x = np.random.randint(0, 255, (8, 150, 256, 340, 3), np.uint8)
print(f"payload: {x.nbytes/1e6:.0f} MB (one 8-clip batch)")
a = jnp.asarray(x[:1, :8]); float(jnp.sum(a.astype(jnp.float32)))  # warm
for i in range(3):
    t0 = time.time()
    a = jnp.asarray(x)
    float(jnp.sum(a[:, :2].astype(jnp.float32)))  # sync
    dt = time.time() - t0
    print(f"upload+sync {dt:.2f}s -> {x.nbytes/1e6/dt:.1f} MB/s")
# smaller chunks: does chunking cost extra per-transfer overhead?
for chunk in (1, 2, 4):
    t0 = time.time()
    parts = [jnp.asarray(x[i:i+chunk]) for i in range(0, 8, chunk)]
    float(jnp.sum(parts[-1][:, :2].astype(jnp.float32)))
    dt = time.time() - t0
    print(f"chunked({chunk} clips) {dt:.2f}s -> {x.nbytes/1e6/dt:.1f} MB/s")
EOF
done

echo "=== e2e stage breakdown" >> $log
for i in 1 2; do
  timeout 1800 env PYTHONPATH=/root/repo:/root/.axon_site python - >> $log 2>&1 <<'EOF' && break
import os, time, tempfile, numpy as np, jax, jax.numpy as jnp
from videoquery.core.config import ExtractionConfig
from videoquery.nn.tsn import TwoStreamTSN
from videoquery.pipeline import decode
from videoquery.pipeline.extract import Extractor, gather_signatures

tmp = tempfile.mkdtemp(prefix="vq_e2e_break_")
video = os.path.join(tmp, "bench.mp4")
decode.synthesize_video(video, n_frames=1204, size=(340, 256))
tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1, 2, 3),
                          dtype=jnp.bfloat16)
ex = Extractor(tsn, ExtractionConfig(batch_clips=8), dtype="bfloat16")
warm = ex.extract_video_stream(video)  # compile warm-up off the clock
n_clips = sum(len(s.clip_numbers) for s in warm)

t0 = time.time()
frames = decode.load_video(video, new_size=ex._decode_size())
t_dec = time.time() - t0
t0 = time.time()
dev = jnp.asarray(np.stack([frames[s:s+150] for s in range(0, 1200, 150)]))
float(jnp.sum(dev[:, :2, 0, 0, 0].astype(jnp.float32)))
t_up = time.time() - t0
t0 = time.time()
sigs = list(ex.extract_frames(frames))
t_comp_disp = time.time() - t0
t0 = time.time()
out = gather_signatures(sigs)
t_gather = time.time() - t0
t0 = time.time()
ex.write_csv_tree(out, tmp, "bench", video)
t_csv = time.time() - t0
print(f"decode {t_dec:.2f}s | upload(1 batch, measured separately) {t_up:.2f}s | "
      f"extract_frames dispatch {t_comp_disp:.2f}s | gather/readback {t_gather:.2f}s | "
      f"csv {t_csv:.2f}s | clips {n_clips}")
t0 = time.time()
sigs = ex.extract_video_stream(video)
ex.write_csv_tree(sigs, tmp, "bench", video)
dt = time.time() - t0
print(f"stream e2e: {n_clips} clips in {dt:.2f}s = {n_clips/dt:.2f} clips/s")
import shutil; shutil.rmtree(tmp, ignore_errors=True)
EOF
done
echo "=== battery6 done $(date)" >> $log
