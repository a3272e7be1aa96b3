"""adamvs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) aerial multi-view-stereo framework.

Re-implements the full capability surface of the Ada-MVS reference
(gpcv-liujin/Ada-MVS, ISPRS 2023) with a TPU-first architecture:

- ``geom``     camera models, convention conversion, projection matrices
- ``io``       PFM / EXR / camera-text codecs (WHU, DTU, BlendedMVS dialects)
- ``data``     sample-list builders and host-side input pipelines
- ``nn``       flax building blocks (conv/GRU cells, feature nets, regularizers)
- ``ops``      plane-sweep warping, hypothesis sampling, depth regression
               (XLA reference impls + Pallas TPU kernels)
- ``models``   AdaMVS and MS-REDNet cascade orchestrators + losses
- ``parallel`` device-mesh / sharding helpers
- ``train``    jitted train/eval steps, optimizer, checkpointing, metrics
- ``predict``  full-resolution streaming prediction engine

The package is layered bottom-up; modules only depend on layers below them.
"""

__version__ = "0.1.0"
