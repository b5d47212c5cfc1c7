
=
example.protoexample"#
Person
name (	
age (