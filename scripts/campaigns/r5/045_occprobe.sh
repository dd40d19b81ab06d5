cd /root/repo
set -x
# occupancy-sharpening probe (VERDICT r4 next #5): samples/ray vs grid
# decay/threshold/update-rounds, each with a staged-render PSNR guard
timeout 3600 python scripts_dev/occ_sharpen_probe.py
