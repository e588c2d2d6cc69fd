#!/usr/bin/env bash
# Reference twin of /root/reference/build_and_run.sh: build the challenge
# image and run local evaluation with the HM3D data mounts.  TPU delta: the
# container needs the TPU devices (--privileged on a TPU VM) instead of
# --gpus=all.
set -e

DOCKER_NAME="peanut_tpu"

DOCKER_BUILDKIT=1 docker build . \
    --build-arg INCUBATOR_VER=$(date +%Y%m%d-%H%M%S) \
    --file docker/peanut_tpu.Dockerfile -t ${DOCKER_NAME}

docker run -v $(pwd)/habitat-challenge-data:/habitat-challenge-data \
    -v $(realpath habitat-challenge-data/data/scene_datasets/hm3d):/habitat-challenge-data/data/scene_datasets/hm3d \
    -v $(realpath habitat-challenge-data/data/scene_datasets/hm3d):/data/scene_datasets/hm3d \
    -v $(pwd)/data:/data \
    --privileged \
    -e "AGENT_EVALUATION_TYPE=local" \
    -e "TRACK_CONFIG_FILE=/challenge_objectnav2022.local.rgbd.yaml" \
    --ipc=host \
    ${DOCKER_NAME}
