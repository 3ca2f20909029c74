"""Checked-in protobuf definitions + generated code (see stac_st.proto)."""
