from .mailbox import (  # noqa: F401
    MESSAGE_SCHEMA,
    flatten_message_parts,
    select_ctb_attachments,
    decode_attachment_data,
)
