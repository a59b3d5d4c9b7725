from .mel import log_mel_spectrogram, mel_filter_bank, whisper_mel_filters, pad_or_trim  # noqa: F401
