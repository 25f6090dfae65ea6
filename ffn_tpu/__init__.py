"""ffn_tpu: a TPU-native Flood-Filling Networks framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of google/ffn
(reference: /root/reference). Instance segmentation of 3D EM volumes via a
recurrent-in-space 3D CNN, built TPU-first:

- the flood-fill inference loop is a device-resident jitted program
  (patch gather -> conv stack -> POM update -> face-max move scoring),
  replacing the reference's thread/queue batching executor;
- training runs as a single SPMD program over a jax.sharding.Mesh;
- public behavioural contracts (InferenceRequest pbtxt, seg-X_Y_Z.npz
  output layout, seed/movement policy semantics) match the reference.
"""

__version__ = "0.1.0"
