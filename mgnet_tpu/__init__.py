"""MGNet-TPU: TPU-native monocular geometric scene understanding.

Joint panoptic segmentation + self-supervised monocular depth (the
capabilities of uulm-mrm/MGNet) rebuilt from scratch for JAX / XLA /
Pallas / pjit. See COMPONENTS.md for the reference-component map.
"""

__version__ = "0.1.0"
