"""Comparison methods plugging into the eval harness via `pred_fn`
(reference `mv3d/baselines/*` — six families adapted through the same
`process_scene` protocol, SURVEY §2.2).  Implemented here as TPU-native
capability-equivalent models, not vendored torch ports."""
