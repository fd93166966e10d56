from copo_tpu.viz.topdown import render_frame, render_rollout

__all__ = ["render_frame", "render_rollout"]
