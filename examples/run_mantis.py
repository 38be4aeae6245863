"""Two-image chat demo — the TPU equivalent of the reference's
examples/run_mantis.py (README demo).

Usage: python examples/run_mantis.py --model /path/to/Mantis-8B-siglip-llama3 \
           --image1 image1.jpg --image2 image2.jpg
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import argparse

from PIL import Image

from mantis_tpu.models.mllava import MantisLlava, chat_mllava


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="local HF checkpoint dir")
    p.add_argument("--image1", default="image1.jpg")
    p.add_argument("--image2", default="image2.jpg")
    args = p.parse_args()

    images = [Image.open(args.image1), Image.open(args.image2)]
    model = MantisLlava.from_pretrained(args.model)

    generation_kwargs = {
        "max_new_tokens": 1024,
        "do_sample": False,
    }

    text = "Describe the difference of <image> and <image> as much as you can."
    response, history = chat_mllava(text, images, model,
                                    **generation_kwargs)
    print("USER: ", text)
    print("ASSISTANT: ", response)

    text = "How many wallets are there in image 1 and image 2 respectively?"
    response, history = chat_mllava(text, images, model, history=history,
                                    **generation_kwargs)
    print("USER: ", text)
    print("ASSISTANT: ", response)


if __name__ == "__main__":
    main()
