# peanut_tpu Habitat Challenge image (reference: /root/reference/peanut.Dockerfile)
#
# Same base as the reference (habitat-sim + habitat-lab challenge 2022 stack,
# the simulator stays host-side C++ — SURVEY.md L0) but the model/compute
# stack is JAX on TPU instead of torch/detectron2/mmcv on CUDA:
#   * no detectron2 / mmcv-full / scikit-fmm — peanut_tpu replaces all three
#     with XLA/Pallas kernels (models/mask_rcnn.py, kernels/fmm*.py);
#   * torch is installed CPU-only, used ONLY by the .pth weight importers
#     (core/checkpoint.py, models/d2_import.py), never on the compute path;
#   * `jax[tpu]` targets the host's TPU via PJRT (the container must run on
#     a TPU VM with /dev/accel* exposed, or set JAX_PLATFORMS=cpu to smoke).
FROM fairembodied/habitat-challenge:testing_2022_habitat_base_docker

RUN /bin/bash -c ". activate habitat"

RUN /bin/bash -c "apt-get update; apt-get install -y libsm6 libxext6 libxrender-dev; . activate habitat; pip install opencv-python"

# JAX TPU stack + the converter-only CPU torch
RUN /bin/bash -c ". activate habitat; pip install --upgrade 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"
RUN /bin/bash -c ". activate habitat; pip install flax optax orbax-checkpoint einops scikit-image imageio"
RUN /bin/bash -c ". activate habitat; pip install torch --index-url https://download.pytorch.org/whl/cpu"

# Install the framework
ADD peanut_tpu /peanut_tpu/peanut_tpu
ADD configs /peanut_tpu/configs
ADD pyproject.toml /peanut_tpu/pyproject.toml
RUN /bin/bash -c ". activate habitat; cd /peanut_tpu; pip install -e ."

ARG INCUBATOR_VER=unknown
ADD scripts/nav_exp.sh /nav_exp.sh
ENV AGENT_EVALUATION_TYPE remote
ENV PYTHONPATH "${PYTHONPATH}:/peanut_tpu"
ENV TRACK_CONFIG_FILE "/challenge_objectnav2022.local.rgbd.yaml"

CMD ["/bin/bash", "-c", "source activate habitat && export PYTHONPATH=/evalai-remote-evaluation:$PYTHONPATH && export CHALLENGE_CONFIG_FILE=$TRACK_CONFIG_FILE && bash /nav_exp.sh"]
