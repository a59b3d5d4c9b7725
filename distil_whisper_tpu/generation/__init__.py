from .generate import (  # noqa: F401
    GenerationOptions, GenerateOutput, generate, encode_and_generate,
    build_generate,
)
from .sequential import (  # noqa: F401
    SequentialOptions, SequentialTranscriber, compression_ratio,
)
from .speculative import (speculative_generate,  # noqa: F401
                          speculative_generate_batched, SpeculativeOutput)
from .beam import beam_search, encode_and_beam_search, BeamOutput  # noqa: F401
