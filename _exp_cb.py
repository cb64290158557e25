import glob, gzip, json
import jax, jax.numpy as jnp

H, W = 480, 640
key = jax.random.PRNGKey(0)
imgs = jax.random.normal(key, (18, H, W), jnp.float32)
par = jnp.int32(1)

@jax.jit
def cb_separate(x, p):
    outs = []
    for c in range(18):
        s = jax.lax.dynamic_slice(x[c], (p, p), (H - 1, W - 1))
        outs.append(s[::2, ::2])
    return jnp.stack(outs)

@jax.jit
def cb_packed(x, p):
    s = jax.lax.dynamic_slice(x, (jnp.int32(0), p, p), (18, H - 1, W - 1))
    return s[:, ::2, ::2]

@jax.jit
def cb_reshape(x, p):
    # stride-2 via reshape-pairs + dynamic index on tiny axes
    x4 = x.reshape(18, H // 2, 2, W // 2, 2)
    return jax.lax.dynamic_slice(
        x4, (jnp.int32(0), jnp.int32(0), p, jnp.int32(0), p),
        (18, H // 2, 1, W // 2, 1),
    )[:, :, 0, :, 0]

@jax.jit
def cb_matmul(x, p):
    # stride-2 lane extraction as a selection matmul on the MXU:
    # [18*240, 640] @ [640, 320] one-hot selection matrix
    rows = jax.lax.dynamic_slice(x, (jnp.int32(0), p, jnp.int32(0)), (18, H - 1, W))[:, ::2, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 0)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (W, W // 2), 1) * 2 + p
    sel = (cols == tgt).astype(jnp.float32)
    return jax.lax.dot_general(rows.reshape(-1, W), sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).reshape(18, H // 2, W // 2)

fns = [("separate", cb_separate), ("packed", cb_packed), ("reshape", cb_reshape), ("matmul", cb_matmul)]
for nm, f in fns:
    jax.block_until_ready(f(imgs, par))
import numpy as np
with jax.profiler.trace("/tmp/jaxtrace_cb"):
    for nm, f in fns:
        o = f(imgs, par)
    _ = np.asarray(o.ravel()[0])
tracefile = sorted(glob.glob("/tmp/jaxtrace_cb/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tracefile) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
for e in ev:
    if e.get("ph") == "X" and pids.get(e.get("pid")) == "/device:TPU:0" and e["name"].startswith("jit_cb"):
        print(f"{e.get('dur',0)/1e3:8.3f} ms  {e['name'][:40]}")
