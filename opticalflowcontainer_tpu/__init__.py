"""opticalflowcontainer_tpu — a TPU-native optical-flow framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capability surface of the ROS2/CUDA reference
``Hagestregen/OpticalFlowContainer`` (see SURVEY.md): classical dense/sparse optical
flow with cv2-parity APIs, learned flow models (LiteFlowNet, LiteFlowNet3, PWC-Net,
RAFT, NeuFlow-class) on Pallas correlation kernels, and a streaming node/topic
runtime that turns pixel flow into metric velocity.

Layout
------
- ``core``      image primitives: resize, warp (3 grid conventions), pyramids,
                color conversion, cv2-parity filters (Gaussian/box/median/CLAHE)
- ``ops``       flow-specific kernels: local correlation (Pallas + lax reference),
                all-pairs correlation volume + lookup, unfold
- ``classical`` Farneback dense flow and pyramidal Lucas-Kanade with
                cv2.calcOpticalFlowFarneback / calcOpticalFlowPyrLK-parity APIs
- ``models``    flax implementations of the learned model zoo + torch converters
- ``runtime``   pub/sub topic bus, camera/file sources, flow / depth / junction /
                velocity nodes (the ROS2-node-equivalent streaming layer)
- ``parallel``  device mesh, sharding rules, multi-chip train/infer steps
- ``native``    host-side C++ junction-point detector (ctypes bindings)
- ``eval``      EPE metrics, Sintel/KITTI harness
- ``utils``     .flo IO, misc
"""

__version__ = "0.1.0"
