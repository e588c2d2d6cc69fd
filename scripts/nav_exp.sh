#!/usr/bin/env bash
# Reference twin of /root/reference/nav_exp.sh: local evaluation loop with
# the same flags/stdout shape, pointed at the peanut_tpu collect CLI.
python -m peanut_tpu.cli.collect -v 0 --dump_location ./data/tmp \
    --exp_name debug --start_ep 0 --end_ep 10 \
    --evaluation "${AGENT_EVALUATION_TYPE:-local}" "$@"
wait
