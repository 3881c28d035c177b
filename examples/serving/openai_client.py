"""Call the OpenAI-compatible server.

Start it first:  fastvideo serve --model-path CKPT --port 8000
"""

import argparse
import json
import time
import urllib.request


def _post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _get(url: str) -> dict:
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.add_argument("--prompt", default="A hummingbird in slow motion")
    args = p.parse_args()

    job = _post(f"{args.base_url}/v1/videos", {
        "prompt": args.prompt,
        "size": "832x480",
        "seconds": 5,
    })
    vid = job["id"]
    print("submitted:", vid)
    while True:
        status = _get(f"{args.base_url}/v1/videos/{vid}")
        if status["status"] in ("completed", "failed"):
            print(json.dumps(status, indent=2))
            break
        time.sleep(2.0)


if __name__ == "__main__":
    main()
