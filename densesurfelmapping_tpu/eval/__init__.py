from .fidelity import render_depth, depth_metrics, evaluate_map
