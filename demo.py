#!/usr/bin/env python3
"""One-line streaming-demo launcher (reference: ``test.py:8-10``).

    python demo.py --wav audio.wav [--checkpoint ckpt_dir] [--gui]

Uses configs/joint_streaming.yaml like the reference launcher; all
stream_demo flags pass through.
"""

import sys

if __name__ == "__main__":
    sys.argv.insert(1, "--config")
    sys.argv.insert(2, "configs/joint_streaming.yaml")
    sys.path.insert(0, "apps")
    from apps.stream_demo import main
    main()
