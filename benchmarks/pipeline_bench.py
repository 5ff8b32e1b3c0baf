"""Recipe-shape feeding-pipeline benchmark (REAL TPU, run alone).

Measured 2026-08-17 (warm, one v5e via tunnel, 64-utt batches):
  f32 sync (round-1 path):      14-21 steps/s   850-1275 audio-sec/s
  int16 (round-2 default):      30-45 steps/s  1800-2650 audio-sec/s
int16 wav transfer roughly DOUBLES warm feeding throughput at recipe
shapes; device_prefetch hides the remaining transfer latency (within
tunnel noise here, grows with batch bytes / host load). The first leg
absorbs per-shape compiles -- treat it as warmup.

Recipe-shape feeding throughput: time N train steps fed through the
REAL host pipeline (AudioDataset -> AudioCollate -> PrefetchLoader ->
DeviceFeeder) on the flagship model, comparing the round-1 path
(float32 wav transfer, synchronous device staging) against the round-2
path (int16 transfer + device_prefetch thread). Run alone on the TPU.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, yaml

# corpus from benchmarks/make_structured_corpus.py + recipe stage 1
work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/recipe_quality"
from openeat_tpu.dataset.dataset import AudioDataset, AudioCollate, PrefetchLoader
from openeat_tpu.dataset.text import load_dict
from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.pipeline import DeviceFeeder
from openeat_tpu.parallel.train_step import build_train_step, init_state
from openeat_tpu.utils.optim import build_optimizer
from openeat_tpu.models.asr_model import build_asr_model

cfg = yaml.safe_load(open(f"{work}/conf_synth.yaml"))
char_dict = load_dict(f"{work}/data/dict.txt")
ds = AudioDataset(f"{work}/data/train/format.data", char_dict, None,
                  max_length=400, min_length=10, batch_type="static",
                  batch_size=64, sort=True, data_type="wav", seed=0)
frontend = FrontendConfig.from_collate_conf(cfg["collate_conf"])
model = build_asr_model(cfg["model_conf"], 80, len(char_dict))
tx, _ = build_optimizer(1e-3, 1000)
step = None
state = None

def run(tag, wav_dtype, prefetch):
    global state, step
    collate = AudioCollate(resample_rate=16000, seed=0, wav_dtype=wav_dtype)
    loader = PrefetchLoader(ds, collate, shuffle_batches=False)
    feeder = DeviceFeeder(loader, frontend, mesh=None, train=True,
                          device_prefetch=prefetch)
    it = iter(feeder)
    _, b0 = next(it)
    if state is None:
        state = init_state(model, tx, b0)
        step = jax.jit(build_train_step(model, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    # warm compile on first batch shape
    rng, k = jax.random.split(rng)
    state_w, m = step(state, b0, k)
    # VALUE fetch for the warmup settle too: block_until_ready acks
    # before remote execution, so a warmup step could bleed into the
    # timed window (ADVICE r3 low #3)
    float(np.asarray(m["loss"])); state_out = state_w
    n = 0
    audio = 0.0
    # audio seconds from the yielded keys' own metadata — robust to any
    # change in loader batch order, and no per-step host sync
    dur = {u.key: u.num_frames * 0.01 for batch_ in ds for u in batch_}
    t0 = time.perf_counter()
    for keys, batch in it:
        rng, k = jax.random.split(rng)
        state_out, m = step(state_out, batch, k)
        audio += sum(dur[k_] for k_ in keys)
        n += 1
        if n >= 120: break
    # VALUE fetch, not block_until_ready: the axon proxy acks readiness
    # before remote execution finishes (benchmarks/_honest.py)
    float(np.asarray(m["loss"]))
    dt = time.perf_counter() - t0
    print(f"{tag}: {n} steps in {dt:.1f}s -> {n/dt:.2f} steps/s, "
          f"{audio/dt:.0f} audio-sec/s", flush=True)

run("warmup (int16, prefetch)  ", "int16", 1)
run("r1-path  (f32, sync)      ", "float32", 0)
run("r1-path  repeat           ", "float32", 0)
run("int16 only                ", "int16", 0)
run("r2-path  (int16, prefetch)", "int16", 1)
run("r2-path  repeat           ", "int16", 1)
