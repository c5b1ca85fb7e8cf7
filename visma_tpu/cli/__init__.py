"""Command-line tools mirroring the reference executables (L5).

  python -m visma_tpu.cli.example_load <dataroot>          (example_load)
  python -m visma_tpu.cli.example_dump <dataroot> <out>    (example_dump)
  python -m visma_tpu.cli.undistort_images <dir>           (undistort_images)
  python -m visma_tpu.cli.generate_depthmaps ...           (generate_depthmaps)
  python -m visma_tpu.cli.render_depth <config.json>       (render_depth)
  python -m visma_tpu.cli.evaluate <tool.json>             (example_evaluate)
  python -m visma_tpu.cli.annotate ...                     (annotation tool)
  python -m visma_tpu.cli.run_vio ...                      (new: the filter)
"""
