"""Dataset construction: landmarks -> 3DMM camera -> crop -> parsing mask.

Mirrors preprocess/run_total.py's per-image pipeline. The perception
models (FaceRecon ResNet-50, FAN landmarker, BiSeNet) run as jitted JAX
functions; the alignment/camera math stays host-side numpy exactly like
the reference (it is per-image scalar work).
"""
