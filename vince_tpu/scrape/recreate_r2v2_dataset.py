"""Exact R2V2 recreation from the published frame-index files.

Parity with reference ``download_scripts/recreate_r2v2_dataset.py:16-109``:
each line of ``r2v2_ids_{train,val}.txt`` is ``video_id,f1,f2,f3,f4`` (frame
indices); videos are downloaded, the exact frames seek-decoded
(``CAP_PROP_POS_FRAMES``), retried up to 10 times, and written to the 2-char
shard layout.
"""

import argparse
import concurrent.futures
import os

import cv2

from vince_tpu.utils import video_utils, youtube_utils


def recreate_video(line: str, out_dir: str, max_side: int = 480) -> bool:
    parts = line.strip().split(",")
    if len(parts) < 2:
        return False
    vid, frame_ids = parts[0], [int(p) for p in parts[1:]]
    im_dir = os.path.join(out_dir, vid[:2])
    if all(
        os.path.exists(os.path.join(im_dir, f"{vid}_{fi:06d}.jpg")) for fi in frame_ids
    ):
        return True
    video = youtube_utils.download_video(vid)
    if video is None:
        return False
    os.makedirs(im_dir, exist_ok=True)
    cap = cv2.VideoCapture(video)
    ok_any = False
    for fi in frame_ids:
        frame = None
        for _ in range(10):  # reference :44-54 retry loop
            cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
            ok, frame = cap.read()
            if ok:
                break
        if frame is None:
            continue
        frame = video_utils.max_resize(frame, max_side)
        cv2.imwrite(os.path.join(im_dir, f"{vid}_{fi:06d}.jpg"), frame)
        ok_any = True
    cap.release()
    try:
        os.remove(video)
    except OSError:
        pass
    return ok_any


def main(argv=None):
    parser = argparse.ArgumentParser(description="Recreate R2V2 from frame-index files")
    parser.add_argument("--ids-file", required=True, help="r2v2_ids_{split}.txt")
    parser.add_argument("--output-path", required=True)
    parser.add_argument("--num-workers", type=int, default=16)
    parser.add_argument("--max-side-size", type=int, default=480)
    args = parser.parse_args(argv)

    with open(args.ids_file) as f:
        lines = [line for line in f if line.strip()]
    os.makedirs(args.output_path, exist_ok=True)
    ok = 0
    with concurrent.futures.ThreadPoolExecutor(args.num_workers) as pool:
        for success in pool.map(
            lambda ln: recreate_video(ln, args.output_path, args.max_side_size), lines
        ):
            ok += bool(success)
    print(f"recreated {ok}/{len(lines)} videos")


if __name__ == "__main__":
    main()
