"""Capture a device trace of the ITM forward and print the top ops by time."""
import glob, os, time
import jax, jax.numpy as jnp, numpy as np
from mvlt_tpu.config import LossType, ModelConfig
from mvlt_tpu.models import create_model

rng = np.random.default_rng(0)
B = 404
images = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
ids = jnp.asarray(rng.integers(0, 30522, (B, 128)), jnp.int32)
cfg = ModelConfig(loss_type=LossType(itm=True, mlm=False, t2i=False, cls=False),
                  compute_dtype="bfloat16", use_pallas_attention=False)
model = create_model(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1], ids[:1])

@jax.jit
def f(images, ids):
    return model.apply(variables, images, ids, train=False)["itm_logits"]

f(images, ids).block_until_ready()
trace_dir = "/tmp/mvlt_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(3):
    f(images, ids).block_until_ready()
jax.profiler.stop_trace()

# parse the xplane
from tensorboard_plugin_profile.convert import raw_to_tool_data
xspaces = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplanes:", xspaces)
data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "framework_op_stats", {})
import io, csv
# data may be json or csv depending on version
out = data.decode() if isinstance(data, bytes) else data
with open("/tmp/op_stats.txt", "w") as fo:
    fo.write(out)
print(out[:3000])
