#!/usr/bin/env python3
"""ESPnet-variant training entry point (reference: ``train_esptt.py``).

Identical loop to ``train.py`` — the Trainer auto-detects the model family
from the config schema (``model.mask`` block => ESPnet variant).  Note the
reference ships this trainer with the ``train()`` call commented out
(``train_esptt.py:248-249``, checkpoint+eval only); here it actually trains.
"""

import sys

from train import main

if __name__ == "__main__":
    if not any(a.startswith(("-config", "--config")) for a in sys.argv[1:]):
        sys.argv.insert(1, "-config")
        sys.argv.insert(2, "configs/espnet_aishell.yaml")
    main()
