import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import py21cmfast_tpu as p21
from py21cmfast_tpu.models import ics as m

_ = float(jnp.zeros(()))  # absorb the D2H handshake

inputs = p21.InputParameters(random_seed=1).evolve_input_structs(
    HII_DIM=256, DIM=512, BOX_LEN=384.0, SOURCE_MODEL="E-INTEGRAL")
so = inputs.simulation_options
hi, lo, bl = so.hires_shape, so.lowres_shape, so.box_lens

for trial in range(2):
    t_all=time.time()
    ln_k, sqrtp = m.power_amplitude_table(inputs)
    key = jax.random.PRNGKey(1)
    t0=time.time(); d_k = m._sample_dk(key, ln_k, sqrtp, hi_shape=hi, box_lens=bl); jax.block_until_ready(d_k); t_sample=time.time()-t0
    t0=time.time(); hd = m._to_real(d_k, hi_shape=hi); jax.block_until_ready(hd); t_real=time.time()-t0
    t0=time.time(); ld = m._filtered_sample(d_k, hi_shape=hi, box_lens=bl, out_shape=lo, do_filter=True); jax.block_until_ready(ld); t_filt=time.time()-t0
    t0=time.time()
    vels=[m._gradient_field(d_k, hi_shape=hi, box_lens=bl, axis=a, out_shape=lo, do_filter=True) for a in range(3)]
    jax.block_until_ready(vels); t_grad=time.time()-t0
    t0=time.time(); v2=m._compute_2lpt(d_k, hi, bl, lo, True); jax.block_until_ready(v2); t_2lpt=time.time()-t0
    print(f"trial{trial}: sample {t_sample:.2f} real {t_real:.2f} filt {t_filt:.2f} grads {t_grad:.2f} 2lpt {t_2lpt:.2f} total {time.time()-t_all:.2f}", flush=True)
