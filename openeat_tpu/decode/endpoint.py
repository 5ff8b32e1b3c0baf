"""CTC-based endpoint detection for the streaming runtimes.

The reference has no online runtime and therefore no endpointing
(SURVEY.md §5); this is part of the TPU build's beyond-reference
serving story. The detector follows the WeNet/kaldi convention of
rules over the greedy CTC path — "silence" is a run of consecutive
blank frames at the decoded tail, measured in encoder positions
(one position = subsampling_rate x 10 ms of audio):

  rule 1: nothing decoded yet and trailing silence >= 5000 ms
          (the speaker never started talking);
  rule 2: something was decoded and trailing silence >= 1000 ms
          (the speaker finished the utterance);
  rule 3: the decoded utterance reached 20000 ms regardless of
          silence (bound the latency of a never-pausing speaker).

Pure host-side bookkeeping over the per-frame argmax tokens the chunk
step already produces — detection adds zero device work.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class EndpointConfig:
    """Thresholds in milliseconds (WeNet-convention defaults)."""
    rule1_min_trailing_silence: float = 5000.0
    rule2_min_trailing_silence: float = 1000.0
    rule3_min_utterance_length: float = 20000.0


class Endpointer:
    """Feed each chunk's greedy frame tokens; `detected` latches True.

    frame_ms: audio milliseconds covered by one encoder position
    (subsampling_rate x frame_shift; 40 ms for the conv2d x4 stack).
    """

    def __init__(self, config: EndpointConfig | None = None, *,
                 frame_ms: float = 40.0, blank_id: int = 0):
        self.config = config or EndpointConfig()
        self.frame_ms = frame_ms
        self.blank_id = blank_id
        self.n_frames = 0          # decoded encoder positions so far
        self.trailing_blanks = 0   # consecutive blanks at the tail
        self.spoke = False         # any non-blank frame seen
        self.detected = False

    def feed(self, frame_tokens) -> bool:
        """Consume the argmax token of each newly decoded frame (in
        order); returns the (latched) endpoint decision."""
        for t in frame_tokens:
            self.n_frames += 1
            if int(t) == self.blank_id:
                self.trailing_blanks += 1
            else:
                self.trailing_blanks = 0
                self.spoke = True
        c = self.config
        silence_ms = self.trailing_blanks * self.frame_ms
        utt_ms = self.n_frames * self.frame_ms
        if not self.detected:
            self.detected = (
                (not self.spoke and silence_ms
                 >= c.rule1_min_trailing_silence)
                or (self.spoke and silence_ms
                    >= c.rule2_min_trailing_silence)
                or (self.spoke and utt_ms >= c.rule3_min_utterance_length))
        return self.detected
