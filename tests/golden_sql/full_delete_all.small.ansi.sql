DELETE FROM resources w WHERE 1=1;

INSERT INTO resources ("href", "key", "modified", "jsondata", "resourcetype") SELECT "href", "key", "modified", "jsondata", "resourcetype" FROM stg;
