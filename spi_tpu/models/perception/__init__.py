"""Perception networks consumed at runtime (weights converted from the
reference checkpoints where available): VGG16 (LPIPS + projector
features), IR-SE50 ArcFace (ID loss), VGG19 slices (contextual loss),
BiSeNet (face parsing), ResNet-50 (Deep3DFaceRecon coefficients).
"""
