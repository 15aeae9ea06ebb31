"""Rigid ORB-SLAM2 comparison mode (the reference's ``#ifdef ORBSLAM`` build,
``Modules/Settings/set_MAC.h:24-25``, ``Modules/Common/System.cc:24-38``).

The deformable system replaces monocular initialization, triangulation and
bundle adjustment with the template machinery; this package provides the
rigid equivalents so the framework can run the reference's A/B baseline:

- :mod:`defslam_tpu.rigid.initializer` — batched H/F RANSAC two-view init
  (``Thirdparty/ORBSLAM_2/src/Initializer.cc``)
- :mod:`defslam_tpu.rigid.triangulation` — epipolar search, batched DLT
  triangulation and point fusion (``LocalMapping::CreateNewMapPoints``,
  ``ORBmatcher::{SearchForTriangulation,Fuse}``)
- :mod:`defslam_tpu.rigid.ba` — Schur-complement bundle adjustment, Sim3 and
  essential-graph optimization (``Optimizer.cc``)
- :mod:`defslam_tpu.rigid.loop_closing` — loop detection + correction
  (``LoopClosing.cc``; disabled in DefSLAM mode by the reference itself)
- :mod:`defslam_tpu.rigid.system` — the rigid tracking/mapping orchestrator
"""
