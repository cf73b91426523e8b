import time, numpy as np, jax, jax.numpy as jnp
from haghighatshoarmuir2024_tpu import CenterCircularArray
from haghighatshoarmuir2024_tpu.models.xylo import Demo
from haghighatshoarmuir2024_tpu.ops.stht import stht
from haghighatshoarmuir2024_tpu.ops.iir import iir_filter
from haghighatshoarmuir2024_tpu.ops.peaks import local_maxima_mask, select_by_distance, find_peaks_mask
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
a_int = np.convolve(a, [1.0,-1.0])
rw = demo.beamfs[0].robust_width
cfg = demo.xylo_config

def s1(s):
    sh = stht(s, kernel, axis=0)
    return jnp.concatenate([sh.real, sh.imag], axis=1)
def s2(s):
    return iir_filter(b, a_int, s1(s), axis=0, method="scan")
def s3(s):
    cs = s2(s).T
    return jnp.concatenate([cs, -cs], axis=0)
def s4(s):
    return local_maxima_mask(s3(s))
def s5(s):
    both = s3(s)
    return find_peaks_mask(both, rw)
def s6(s):
    both = s3(s)
    masks = find_peaks_mask(both, rw)
    C = both.shape[0]//2
    peaks, valleys = masks[:C], masks[C:]
    pos = (peaks & ~valleys).astype(jnp.int32)
    neg = valleys.astype(jnp.int32)
    return jnp.concatenate([pos.T, neg.T], axis=1)
stages = [("stht", s1), ("+iir-int", s2), ("+T/concat", s3), ("+localmax", s4), ("+select", s5), ("+polarity", s6)]
for name, fn in stages:
    f = jax.jit(jax.vmap(fn))
    y = f(frames_j); jax.block_until_ready(y)
    t0=time.time()
    for _ in range(5): y = f(frames_j)
    jax.block_until_ready(y); print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
def full(s):
    enc = jax.vmap(s6)(s)
    counts = lif_count_rates(cfg, enc.astype(jnp.int8))
    return counts
f = jax.jit(full)
y = f(frames_j); jax.block_until_ready(y)
t0=time.time()
for _ in range(5): y = f(frames_j)
jax.block_until_ready(y); print(f"full+lif: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
