import time, numpy as np, jax, jax.numpy as jnp
from haghighatshoarmuir2024_tpu import CenterCircularArray
from haghighatshoarmuir2024_tpu.models.xylo import Demo
from haghighatshoarmuir2024_tpu.models.xylo.pipeline import _spike_encoding_core
from haghighatshoarmuir2024_tpu.ops.stht import stht
from haghighatshoarmuir2024_tpu.ops.iir import iir_filter
from haghighatshoarmuir2024_tpu.ops.peaks import find_peaks_mask, local_maxima_mask_bounded, select_by_distance
from haghighatshoarmuir2024_tpu.ops.interp import signal_from_template
from haghighatshoarmuir2024_tpu.ops.pallas.lif_kernel import lif_count_rates
fs=48000; B=64
geometry = CenterCircularArray(radius=4.5e-2, num_mic=7)
demo = Demo(geometry=geometry, freq_bands=[[1600,1900]], doa_list=np.linspace(-np.pi,np.pi,449),
            recording_duration=0.25, kernel_duration=10e-3, bipolar_spikes=True, fs=fs)
t = np.arange(0, 0.25, 1/fs); sig = np.sin(2*np.pi*1750*t)
frames_j = jnp.asarray(np.stack([np.asarray(signal_from_template(geometry, t, sig, d, fs=fs)) for d in np.linspace(-np.pi,np.pi,B,endpoint=False)]).astype(np.float32))
kernel = jnp.asarray(demo.beamfs[0].kernel, dtype=jnp.float32)
b, a = demo.filterbank.ba_list[0]
rw = demo.beamfs[0].robust_width
cfg = demo.xylo_config

def s1(s):
    sh = stht(s, kernel, axis=0)
    return jnp.concatenate([sh.real, sh.imag], axis=1)
def s2(s):
    return jnp.cumsum(iir_filter(b, a, s1(s), axis=0, method="blocked"), axis=0)
def s3(s):
    cs = s2(s).T
    return jnp.concatenate([cs, -cs], axis=0)
def s4(s):
    return local_maxima_mask_bounded(s3(s), 2*rw)
def s5(s):
    both = s3(s)
    return find_peaks_mask(both, rw, max_plateau=2*rw)
stages = [("stht", s1), ("+iir blocked+cumsum", s2), ("+T/concat", s3), ("+localmax_b", s4), ("+select", s5)]
for name, fn in stages:
    f = jax.jit(jax.vmap(fn))
    y = f(frames_j); jax.block_until_ready(y)
    t0=time.time()
    for _ in range(10): y = f(frames_j)
    jax.block_until_ready(y); print(f"{name}: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
def full(s):
    enc = jax.vmap(lambda x: _spike_encoding_core(x, kernel, bas=demo._bas, robust_width=rw, bipolar=True))(s)
    return lif_count_rates(cfg, enc.astype(jnp.int8))
f = jax.jit(full)
y = f(frames_j); jax.block_until_ready(y)
t0=time.time()
for _ in range(10): y = f(frames_j)
jax.block_until_ready(y); print(f"full: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
