"""delta_graph_slam_tpu — a TPU-native LiDAR graph-SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``KennyRotella/delta_graph_slam`` (an hdl_graph_slam extension):

- ``geom``      SE2/SE3 geometry, Mercator projection, segment interpolation.
- ``ops``       point-cloud kernels: voxel filters, outlier removal, kNN
                normals, RANSAC (plane/line), voxel-hash neighbor search.
- ``register``  batched Gauss-Newton/LM registration engine with ICP, GICP,
                VGICP and NDT cost heads (replaces PCL/ndt_omp/fast_gicp).
- ``lines``     line-feature scan matcher against building outlines
                (replaces the reference's LineBasedScanmatcher).
- ``graph``     SE2/SE3 pose-graph core: typed edge tables, robust kernels,
                level-masked sparse LM with PCG (replaces g2o + CHOLMOD).
- ``models``    assembled pipeline stages mirroring the reference nodelets:
                prefiltering, scan-matching odometry, floor detection,
                graph-SLAM backend.
- ``pipeline``  host runtime: bounded queues, watermark flow control,
                orchestration of the stage graph.
- ``io``        dataset/bag shim, NMEA parser, PCD writer, OSM XML.
- ``config``    typed config tree mirroring the reference launch files.
- ``parallel``  device-mesh scaling: data-parallel multi-bag registration,
                sharded pose-graph solves.
- ``utils``     profiling, logging, debug dumps.
"""

__version__ = "0.1.0"
