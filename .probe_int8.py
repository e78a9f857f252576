import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)

B, H, W, C = 32, 160, 160, 128
LAYERS = 12

def convnet_bf16(x, ws):
    for w in ws:
        x = lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
            dimension_numbers=("NHWC","HWIO","NHWC"),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(x, 0).astype(jnp.bfloat16)
    return x.sum()

def convnet_int8(x, ws):
    # emulate quantized inference: int8 conv -> int32 -> requant to int8
    for w in ws:
        y = lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
            dimension_numbers=("NHWC","HWIO","NHWC"),
            preferred_element_type=jnp.int32)
        x = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
    return x.astype(jnp.int32).sum()

ws_bf = [jnp.asarray(rng.standard_normal((3,3,C,C)).astype(np.float32)).astype(jnp.bfloat16) for _ in range(LAYERS)]
ws_i8 = [jnp.asarray(rng.integers(-4,5,(3,3,C,C),np.int8)) for _ in range(LAYERS)]
x_bf = jnp.asarray(rng.standard_normal((B,H,W,C)).astype(np.float32)).astype(jnp.bfloat16)
x_i8 = jnp.asarray(rng.integers(-4,5,(B,H,W,C),np.int8))

for name, f, x, ws in (("bf16", convnet_bf16, x_bf, ws_bf), ("int8", convnet_int8, x_i8, ws_i8)):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(x, ws))
    t0=time.time()
    for _ in range(10): out = jf(x, ws)
    jax.block_until_ready(out)
    ms = (time.time()-t0)/10*1e3
    flops = 2*B*H*W*C*C*9*LAYERS
    print(f"{name} 12-layer convnet: {ms:.2f} ms ({flops/ms/1e9:.0f} TOP/s)", flush=True)
