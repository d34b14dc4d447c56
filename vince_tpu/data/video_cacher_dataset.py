"""Video download + frame-cache "dataset".

Parity with reference ``datasets/video_cacher_dataset.py``: ``__getitem__``
*downloads* a YouTube video and caches filtered frames — the loader's worker
pool doubles as the download pool (SURVEY.md §3.5). Filter cascade
(:93-188): similar-frame dedup → [length cap] → border removal → Laplacian
blur filter → optional optical-flow filter → optional shot detection; frames
saved as max-side-480 JPEGs into 2-char shard dirs (:190-210). Returns
C-style status codes (:79-80): 0 ok, 1 download failed, 2 filters exhausted,
3 no shot long enough.
"""

import os
import random
from typing import List, Tuple

import cv2
import numpy as np

from vince_tpu.utils import video_utils, youtube_utils


class VideoCacherDataset:
    def __init__(self, args, video_ids: List[str], output_path: str,
                 filter_similar_frames: bool = True,
                 filter_using_laplacian: bool = True,
                 filter_using_flow: bool = False,
                 num_frames_to_cache: int = 4):
        self.args = args
        self.uncached_ids = video_ids
        self.output_path = output_path
        self.filter_similar_frames = filter_similar_frames
        self.filter_using_laplacian = filter_using_laplacian
        self.filter_using_flow = filter_using_flow
        self.num_frames_to_cache = num_frames_to_cache
        self.max_video_length = getattr(args, "max_video_length", 512)

    def __len__(self):
        return len(self.uncached_ids)

    def __getitem__(self, idx) -> Tuple[str, int]:
        video_id = self.uncached_ids[idx]
        video = youtube_utils.download_video(video_id)
        if video is None:
            return video_id, 1

        found = False
        for _ in range(2):  # retry the (cheap) filter cascade, reference :92
            result = video_utils.get_frames(
                video, getattr(self.args, "video_sample_rate", 5),
                max_frames=self.max_video_length, return_inds=True,
            )
            if result is None or result[0] is None:
                continue
            frames, frame_inds = result

            prev_frames = None
            if self.filter_using_flow:
                prev_frames = [f.copy() for f in frames[:-1]]
                frames, frame_inds = frames[1:], frame_inds[1:]

            if self.filter_similar_frames:
                frames, keep = video_utils.filter_similar_frames(frames, return_inds=True)
                if len(frames) < self.num_frames_to_cache:
                    continue
                frame_inds = frame_inds[keep]
                if prev_frames is not None:
                    prev_frames = [prev_frames[i] for i in keep]

            if 0 < self.max_video_length < len(frames):
                start = random.randint(0, len(frames) - self.max_video_length - 1)
                sl = slice(start, start + self.max_video_length)
                frames, frame_inds = frames[sl], frame_inds[sl]
                if prev_frames is not None:
                    prev_frames = prev_frames[sl]

            frames, (x1, x2, y1, y2) = video_utils.remove_border(frames, return_inds=True)
            if frames[0].shape[0] == 0 or frames[0].shape[1] == 0:
                continue
            frames = np.stack(frames)
            if prev_frames is not None:
                prev_frames = np.stack([p[y1:y2, x1:x2] for p in prev_frames])

            if self.filter_using_laplacian:
                frames, keep = video_utils.filter_using_laplacian(frames, return_inds=True)
                if len(frames) < self.num_frames_to_cache:
                    continue
                frame_inds = frame_inds[keep]
                if prev_frames is not None:
                    prev_frames = prev_frames[keep]

            if self.filter_using_flow:
                frames, _, keep = video_utils.filter_using_flow(
                    prev_frames, frames, return_inds=True
                )
                if len(frames) < self.num_frames_to_cache:
                    continue
                frame_inds = frame_inds[keep]

            found = True
            break

        try:
            os.remove(video)
        except OSError:
            pass
        if not found:
            return video_id, 2

        if getattr(self.args, "only_use_shots", False):
            shots, borders = video_utils.get_shots(frames, return_inds=True)
            shot_ids = [frame_inds[borders[i]: borders[i + 1]] for i in range(len(borders) - 1)]
        else:
            shots, shot_ids = [frames], [frame_inds]

        long_enough = [i for i, s in enumerate(shots) if len(s) >= self.num_frames_to_cache]
        if not long_enough:
            return video_id, 3
        for i in long_enough:
            s, ids = shots[i], shot_ids[i]
            start = random.randint(0, len(s) - self.num_frames_to_cache)
            self.cache_images(
                s[start: start + self.num_frames_to_cache], video_id,
                ids[start: start + self.num_frames_to_cache],
                max_side_size=getattr(self.args, "max_side_size", 480),
            )
        return video_id, 0

    def cache_images(self, frames, vid_id, frame_inds, max_side_size: int = 480):
        im_dir = os.path.join(self.output_path, vid_id[:2])
        os.makedirs(im_dir, exist_ok=True)
        for image, image_id in zip(frames, frame_inds):
            if image.ndim != 3:
                continue
            if max_side_size > 0:
                image = video_utils.max_resize(image, max_side_size)
            cv2.imwrite(
                os.path.join(im_dir, f"{vid_id}_{int(image_id):06d}.jpg"),
                np.asarray(image)[:, :, ::-1],
            )
