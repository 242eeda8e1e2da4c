"""textmae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) learned image-compression framework.

Re-designed from scratch with the capabilities of the MCM ("Masked Compression
Model") reference pipeline (tmkhang1999/TextMAE-Image-Compression):

  1. Text stage      — BLIP-2 captioner wrapper        (`textmae_tpu.models.blip`)
  2. Compression     — score-masked ViT-MAE autoencoder with a channel-conditional
                       hyperprior entropy model          (`textmae_tpu.models.mcm`)
  3. Refinement      — SDXL img2img refiner wrapper      (`textmae_tpu.models.diffusion`)

plus the vendored-MAE secondary workload (pretrain / finetune / linprobe).

Layout:
  ops/       ViT blocks (Pallas fused attention), patchify, pos-embed, convs, SSIM, STE
  entropy/   factorized prior (EntropyBottleneck) + GaussianConditional in pure JAX
  coding/    C++ rANS bitstream codec + quantized-CDF builder + Huffman side-info coder
  masking/   vectorized score-guided token selection (no host loops)
  models/    MCM, MAE family, ViT classifier, BLIP-2 / SDXL wrappers
  losses/    RD loss, SSIM/MS-SSIM, VGG16 perceptual (flax)
  data/      host input pipeline (PIL/cv2), score-map generation, dataset registry
  train/     jitted train step, dual optax optimizers, Orbax checkpointing, logging
  eval/      compress/decompress harness, PSNR/MS-SSIM, bpp accounting, JSON report
  parallel/  mesh construction, sharding rules (dp/tp), distributed init
  cli/       train / test / generate-scores / MAE entry points
"""

__version__ = "0.1.0"
