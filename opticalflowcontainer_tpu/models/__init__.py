"""Learned flow model zoo (flax/linen, NHWC, bf16-friendly).

TPU-native re-designs of the reference's model surface (SURVEY.md §2.2):

- :class:`PWCNet` — 6-level pyramid, DenseNet decoders, dilated refiner
  (reference pwc_net.py:43-231).
- :class:`LiteFlowNet` — levels 2..6, Matching/Subpixel/Regularization
  (reference liteflownet.py).
- :class:`LiteFlowNet3` — levels 3..6 with confidence maps and flow-field
  deformation (reference liteflownet3.py).
- :class:`RAFTSmall` / :class:`RAFT` — all-pairs correlation + ConvGRU
  refinement (BASELINE config 4; reference capability visualize_raft.py).
- :class:`NeuFlowLite` — NeuFlow-v2-class efficient streaming model
  (reference nueflow/neuflow_node.py capability).

All models expose ``__call__(img1, img2)`` (NHWC float images) returning flow
``[..., H', W', 2]`` at the model's native output scale, plus an
``estimate(params, img1, img2)`` wrapper implementing the reference pre/post
contract: pad/resize to the stride multiple, forward, resize back, rescale
u and v (reference lfn3_sub_node.py:181-199, pwc_net.py:233-257).

``convert`` holds torch-checkpoint -> flax-params key mappers.
"""
from .pwcnet import PWCNet
from .liteflownet import LiteFlowNet
from .liteflownet3 import LiteFlowNet3
from .raft import RAFT, RAFTSmall
from .neuflow import NeuFlowLite
from .neuflow_v2 import NeuFlowV2

__all__ = ["PWCNet", "LiteFlowNet", "LiteFlowNet3", "RAFT", "RAFTSmall",
           "NeuFlowLite", "NeuFlowV2"]
