"""multipathnet_tpu — TPU-native MultiPath object detection framework.

A ground-up JAX/XLA/Pallas rebuild of facebookresearch/multipathnet
(MultiPath network, arXiv:1604.02135; Fast R-CNN base, arXiv:1504.08083).
See DESIGN.md for conventions and SURVEY.md for the structural spec.
"""

__version__ = "0.1.0"
