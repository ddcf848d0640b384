import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from vehicle_counting_tpu.pipeline import enable_compilation_cache
enable_compilation_cache()
from vehicle_counting_tpu.models.yolo import YoloConfig, init_yolov5, yolov5_forward
from vehicle_counting_tpu.ops.letterbox import host_letterbox_yuv420, yuv420_content_to_full, yuv420_to_rgb
B,H,W=32,720,1280; det_hw=(640,640)
ycfg=YoloConfig(variant="yolov5s", num_classes=80)
params=init_yolov5(jax.random.PRNGKey(0), ycfg)
rng=np.random.default_rng(0)
fr=host_letterbox_yuv420(rng.integers(0,255,size=(B,H,W,3),dtype=np.uint8),det_hw,content_only=True)
@jax.jit
def fwd_only(params, fr):
    full = yuv420_content_to_full(fr, (H,W), det_hw)
    rgb = yuv420_to_rgb(full)
    heads = yolov5_forward(params, (rgb/255.0).astype(jnp.bfloat16), ycfg, dtype=jnp.bfloat16)
    return [h.sum() for h in heads]
c = fwd_only.lower(params, jnp.asarray(fr)).compile()
txt = c.as_text()
open("/tmp/fwd_hlo.txt","w").write(txt)
print(len(txt))
