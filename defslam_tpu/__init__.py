"""defslam_tpu — a TPU-native deformable monocular SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DefSLAM
(Lamarca et al., arXiv:1908.08918; reference C++ implementation
UZ-SLAMLab/DefSLAM).  Nothing here is a translation: the reference's
pointer-graph + mutex + per-point-serial-solver architecture is replaced by
fixed-capacity structure-of-arrays state, batched robust Levenberg-Marquardt,
and jit/shard_map-compiled pure functions, so every stage of the pipeline is a
single large batched device computation.

Top-level layout (mirrors SURVEY.md section 2's component inventory):

- ``geometry``   : SE(3)/Sim(3) Lie groups, pinhole camera model.
- ``ops``        : compute kernels — bicubic B-splines (reference
  ``Thirdparty/BBS``), batched LM/GN solver (replaces g2o *and* Ceres), image
  pyramid / FAST / ORB descriptors (reference ``ORBextractor.cc``), Hamming
  matchers (``ORBmatcher.cc``), NCC ground-truth correlation.
- ``mapstore``   : SoA map state — keyframes, map points, template mesh
  (reference ``Map``/``KeyFrame``/``MapPoint``/``Template`` hierarchies).
- ``template``   : triangular Laplacian mesh construction + barycentric
  embedding (reference ``Modules/Template``).
- ``tracking``   : Shape-from-Template tracking
  (reference ``Modules/Tracking``).
- ``mapping``    : isometric NRSfM — Schwarzian-regularized warps, normal
  estimation, shape-from-normals, Sim(3) surface registration
  (reference ``Modules/Mapping``).
- ``groundtruth``: stereo/CT evaluation harness
  (reference ``Modules/GroundTruth``).
- ``parallel``   : device-mesh sharding of the mapping/tracking work
  (no reference equivalent — the reference is single-process CPU).
- ``io``         : dataset loaders (Mandala / Hamlyn / CT layouts) and
  result-file writers compatible with the reference's ErrorGTs/Matches
  text outputs.
- ``system``     : the public API (reference ``Modules/Common/System.cc``).
"""

__version__ = "0.1.0"

from defslam_tpu.config import Config  # noqa: F401
