"""Device-side compute ops (the TPU analog of the reference's shaders/)."""
