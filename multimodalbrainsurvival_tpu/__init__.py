"""multimodalbrainsurvival_tpu — a TPU-native multimodal brain-tumor survival framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capability surface of
``gevaertlab/MultiModalBrainSurvival`` (mounted read-only at ``/root/reference``):

- WSI tiling with Otsu tissue segmentation (``data.tiler``)
- ResNet histopathology patch encoders with MIL aggregation (``models``)
- 12,778-gene RNA-seq MLP encoder (``models.rna``)
- Cox partial-likelihood + discrete-time NLL survival losses (``ops.cox``,
  ``ops.nll_surv``) with exact reference-parity semantics and numerically
  corrected variants
- early / late / joint fusion (``models.fusion``, ``ops.coxnet``)
- a single generic config-driven train/eval/savescore/extractfeatures driver
  (``train``, ``cli``) consuming the reference's JSON config schema verbatim
- first-class SPMD parallelism over a ``jax.sharding.Mesh`` (``parallel``)

The reference is cited throughout as ``<file>:<line>`` into ``/root/reference``.
"""

__version__ = "0.1.0"
